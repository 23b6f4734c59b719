"""Public-API surface pin — the apidoc/tests/public_api_doc.rs analog.

The reference asserts its rendered public surface matches a committed
listing (docs/public-api/butteraugli.txt) so accidental surface breaks
fail CI. Same contract here: docs/public-api.txt is the supported
surface; any add/remove/signature change must be deliberate —
regenerate with `python tools/api_surface.py > docs/public-api.txt`
and commit the diff alongside the change that caused it.
"""

import difflib
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

PINNED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "public-api.txt",
)


def test_public_api_surface_matches_pinned_listing():
    import api_surface

    live = api_surface.render()
    with open(PINNED, encoding="utf-8") as f:
        pinned = f.read()
    if live != pinned:
        diff = "\n".join(
            difflib.unified_diff(
                pinned.splitlines(), live.splitlines(),
                fromfile="docs/public-api.txt (pinned)",
                tofile="live surface",
                lineterm="",
            )
        )
        raise AssertionError(
            "public API surface changed — if intentional, regenerate "
            "the pin: python tools/api_surface.py > docs/public-api.txt\n"
            + diff
        )


def test_every_sparkval_module_is_pinned():
    """A module added to the package without being added to the pinned
    surface is itself a surface break."""
    import api_surface

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "sparkval"
    )
    found = set()
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, fn), os.path.dirname(root))
            mod = rel[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            found.add(mod)
    assert found == set(api_surface.MODULES), (
        "module set drifted from tools/api_surface.py MODULES: "
        f"missing={sorted(found - set(api_surface.MODULES))} "
        f"extra={sorted(set(api_surface.MODULES) - found)}"
    )
