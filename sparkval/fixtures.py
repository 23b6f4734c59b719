"""Deterministic synthetic corpus fixtures — the engine's generator zoo.

Mirrors the reference's fixture system
(/root/reference/butteraugli/tests/common/generators.rs:37-59): a
fixed-constant LCG PRNG, a generator zoo (the "images"), a distortion
zoo (the "distortions"), and case names that fully encode their own
construction (generators.rs:24-30), so any golden row regenerates from
its name alone. Seed=42 everywhere (TESTDATA.md convention).

Everything is vectorized numpy; corpus tables materialize as pandas
DataFrames and enter Spark via Arrow (spark.createDataFrame).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from sparkval.config import LANG_VOCAB

# LCG constants identical to the reference's PRNG (generators.rs:37-59)
# — same sequence discipline, not the same outputs (we draw u64 streams,
# they draw pixels).
LCG_MUL = np.uint64(6364136223846793005)
LCG_INC = np.uint64(1442695040888963407)
SEED = 42

_REAL_LANGS = [l for l in LANG_VOCAB if l != "other"]
_EXT = {
    "c": "c", "go": "go", "js": "js", "md": "md",
    "python": "py", "rust": "rs", "toml": "toml", "txt": "txt",
}
# Per-lang printable-byte alphabets: distinct byte-frequency signatures
# so the byte_hist channel separates languages (the recast's "colors").
_ALPHABET = {
    "python": b"def return self import ():=_#\n    abcdefghijklmnop",
    "rust": b"fn let mut impl pub struct ::{};&\n    qrstuvwxyz<>'",
    "c": b"int void static struct *&->{};\n\t#include abcdef",
    "go": b"func package var range := {}\n\tgo chan map ghijkl",
    "js": b"const let => function var {};()\n  async await mnop",
    "md": b"# ## - * [link](url) `code` text words sentences.\n\n",
    "toml": b"[section]\nkey = \"value\"\n# comment\ntrue false 0123",
    "txt": b"the quick brown fox jumps over lazy dogs and cats. ",
}


class Lcg:
    """Vectorized 64-bit LCG; deterministic across platforms."""

    def __init__(self, seed: int = SEED):
        self.state = np.uint64(seed)

    def next_block(self, n: int) -> np.ndarray:
        """n u64 draws as a vector (state advances by n)."""
        # cumulative LCG: s_{k+1} = s_k * MUL + INC; vectorized via
        # the closed form s_k = MUL^k * s_0 + INC * (MUL^k - 1)/(MUL - 1)
        # is overkill — just iterate in C-speed chunks via np.
        out = np.empty(n, dtype=np.uint64)
        s = self.state
        with np.errstate(over="ignore"):
            for i in range(n):
                s = s * LCG_MUL + LCG_INC
                out[i] = s
        self.state = s
        return out

    def uniform(self, n: int) -> np.ndarray:
        """n floats in [0, 1)."""
        return (self.next_block(n) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _fast_u64_stream(seed: int, n: int) -> np.ndarray:
    """O(n) vectorized LCG stream using jump-ahead closed form.

    s_k = A^k s_0 + C (A^{k-1} + ... + 1). We compute it with a
    log-doubling prefix: generate per-index multipliers A^k and prefix
    sums of the geometric series, all mod 2^64 (numpy uint64 wraps).
    """
    with np.errstate(over="ignore"):
        ks = np.arange(1, n + 1, dtype=np.uint64)
        # Compute A^k and G(k) = sum_{i<k} A^i via binary decomposition.
        a_pow = np.ones(n, dtype=np.uint64)
        geo = np.zeros(n, dtype=np.uint64)
        cur_a = LCG_MUL
        cur_g = np.uint64(1)  # G for a single step at current doubling level
        bit = np.uint64(1)
        maxbit = int(n).bit_length() + 1
        for _ in range(64):
            mask = (ks & bit) != 0
            if mask.any():
                geo[mask] = geo[mask] * cur_a + cur_g
                a_pow[mask] = a_pow[mask] * cur_a
            cur_g = cur_g * cur_a + cur_g
            cur_a = cur_a * cur_a
            bit = bit << np.uint64(1)
            if int(bit) > (1 << maxbit):
                break
        return a_pow * np.uint64(seed) + geo * LCG_INC


def _u01(seed: int, n: int) -> np.ndarray:
    return (_fast_u64_stream(seed, n) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _lang_mix(generator: str) -> np.ndarray:
    """Per-generator language mixture over _REAL_LANGS."""
    k = len(_REAL_LANGS)
    if generator.startswith("uniform_"):
        lang = generator.split("_", 1)[1]
        w = np.full(k, 0.01)
        w[_REAL_LANGS.index(lang)] = 1.0
    elif generator == "gradient_len":
        w = np.linspace(1.0, 2.0, k)
    elif generator == "bimodal_len":
        w = np.ones(k)
    elif generator == "random_mid":
        w = np.ones(k)
    elif generator == "sine_bytes":
        w = 1.0 + 0.5 * np.sin(np.arange(k))
    else:
        raise ValueError(f"unknown generator {generator!r}")
    return w / w.sum()


def _lengths(generator: str, n: int, seed: int) -> np.ndarray:
    """Per-file content lengths; distribution is the generator's 'shape'."""
    u = _u01(seed ^ 0xBEEF, n)
    if generator == "gradient_len":
        # lengths sweep the log2 bin range (analog of gen_gradient_h)
        ln = np.exp(np.log(16) + u * (np.log(20000) - np.log(16)))
    elif generator == "bimodal_len":
        short = 30 + (u * 50)
        long_ = 4000 + (u * 4000)
        pick = _u01(seed ^ 0xB1B0, n) < 0.5
        ln = np.where(pick, short, long_)
    else:
        # log-normal-ish default
        v = _u01(seed ^ 0x51DE, n)
        ln = np.exp(4.5 + 1.2 * (u + v - 1.0) * 1.7)
    return np.clip(ln, 1, 60000).astype(np.int64)


def _contents(langs: np.ndarray, lengths: np.ndarray, seed: int, generator: str) -> list[str]:
    """Vectorized content synthesis: one big LCG byte stream sliced per row."""
    total = int(lengths.sum())
    raw = _fast_u64_stream(seed ^ 0xC0DE, total)
    if generator == "sine_bytes":
        # periodic byte structure (analog of gen_sine_wave): index the
        # alphabet with a sine-modulated position, not uniform draws
        t = np.arange(total, dtype=np.float64)
        idx_f = (np.sin(t * 0.07) * 0.5 + 0.5) * 0.7 + (raw >> np.uint64(40)).astype(np.float64) / float(1 << 24) * 0.3
    elif generator == "random_mid":
        # printable byte soup (analog of gen_random_midrange)
        mid = 32 + ((raw >> np.uint64(32)).astype(np.uint64) % np.uint64(95))
        arr = mid.astype(np.uint8)
        out, off = [], 0
        for ln in lengths:
            out.append(arr[off : off + ln].tobytes().decode("latin-1"))
            off += ln
        return out
    else:
        idx_f = (raw >> np.uint64(40)).astype(np.float64) / float(1 << 24)

    out, off = [], 0
    for lang, ln in zip(langs, lengths):
        alpha = np.frombuffer(_ALPHABET[lang], dtype=np.uint8)
        sl = idx_f[off : off + ln]
        chars = alpha[(sl * len(alpha)).astype(np.int64) % len(alpha)]
        out.append(chars.tobytes().decode("latin-1"))
        off += ln
    return out


def make_corpus(
    generator: str = "random_mid",
    n_rows: int = 2000,
    n_repos: int = 20,
    seed: int = SEED,
    zipf_hot_repo: bool = True,
) -> pd.DataFrame:
    """Build the baseline corpus table for a named generator.

    ``zipf_hot_repo``: repo r0 takes ~30% of rows (FIXTURES.md §1) to
    exercise salting / AQE skew handling in tests and benches.
    """
    u_repo = _u01(seed ^ 0x4E90, n_rows)
    if zipf_hot_repo:
        # r0 hot; remaining mass Zipf-ish over the tail
        ranks = np.where(
            u_repo < 0.30,
            0,
            1 + (np.power(u_repo, 2.0) * (n_repos - 1)).astype(np.int64) % (n_repos - 1),
        )
    else:
        ranks = (u_repo * n_repos).astype(np.int64)
    repos = np.array([f"r{r}" for r in ranks])

    mix = _lang_mix(generator)
    u_lang = _u01(seed ^ 0x7A6B, n_rows)
    lang_idx = np.searchsorted(np.cumsum(mix), u_lang, side="right")
    langs = np.array(_REAL_LANGS, dtype=object)[np.clip(lang_idx, 0, len(_REAL_LANGS) - 1)]

    # C commits per repo, deterministic hex ids
    n_commits = 4
    u_commit = _u01(seed ^ 0xC077, n_rows)
    commit_slot = (u_commit * n_commits).astype(np.int64)
    commits = np.array(
        [
            hashlib.sha1(f"{r}@{c}".encode()).hexdigest()[:12]
            for r, c in zip(repos, commit_slot)
        ]
    )

    file_no = np.arange(n_rows)
    paths = np.array(
        [
            f"dir{int(fn) % 7}/dir{(int(fn) // 7) % 5}/f{int(fn)}.{_EXT[l]}"
            for fn, l in zip(file_no, langs)
        ]
    )
    lengths = _lengths(generator, n_rows, seed)
    contents = _contents(langs, lengths, seed, generator)

    return pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "lang": langs.astype(str),
            "content": contents,
        }
    )


def make_commits(corpus: pd.DataFrame) -> pd.DataFrame:
    """Referential parent table: the distinct (repo, commit) pairs."""
    return corpus[["repo", "commit"]].drop_duplicates().reset_index(drop=True)


# ---------------------------------------------------------------------------
# Distortion zoo (FIXTURES.md §4; analog of generators.rs:318-414)
# ---------------------------------------------------------------------------

def distort(corpus: pd.DataFrame, distortion: str, seed: int = SEED) -> pd.DataFrame:
    """Apply a named distortion to a copy of the corpus (the 'snapshot')."""
    df = corpus.copy()
    name, _, arg = distortion.partition("_")
    n = len(df)

    if distortion == "identity":
        return df

    if name == "shift":  # byte-value shift -> uniform byte_hist drift
        k = int(arg)
        tbl = bytes((min(32 + ((b - 32 + k) % 95), 126)) if 32 <= b < 127 else b for b in range(256))
        df["content"] = [c.translate(str.maketrans({chr(i): chr(tbl[i]) for i in range(256)})) if c else c for c in df["content"]]
    elif name == "noise":  # inject LCG byte noise -> HF drift, appearing mass
        nseed, amp = arg.split("_")
        amp = float(amp)
        u = _u01(int(nseed), n)
        pick = u < min(1.0, amp)
        new = []
        for i, (c, p) in enumerate(zip(df["content"], pick)):
            if p and c:
                stream = _fast_u64_stream(int(nseed) * 7919 + i, max(1, len(c) // 4))
                noise_chars = (33 + (stream >> np.uint64(33)) % np.uint64(90)).astype(np.uint8)
                pos = (stream % np.uint64(max(1, len(c)))).astype(np.int64)
                arr = np.frombuffer(c.encode("latin-1"), dtype=np.uint8).copy()
                arr[pos] = noise_chars
                new.append(arr.tobytes().decode("latin-1"))
            else:
                new.append(c)
        df["content"] = new
    elif name == "truncate":  # remove tails -> disappearing mass ("blur" side)
        pct = float(arg) / 100.0
        df["content"] = [c[: max(1, int(len(c) * (1 - pct)))] if c else c for c in df["content"]]
    elif name == "quantize":  # collapse byte diversity
        levels = int(arg)
        step = max(1, 95 // levels)
        tbl = {chr(b): chr(32 + ((b - 32) // step) * step) if 32 <= b < 127 else chr(b) for b in range(256)}
        df["content"] = [c.translate(str.maketrans(tbl)) if c else c for c in df["content"]]
    elif name == "langswap":  # relabel a fraction of langs
        frac = float(arg) / 100.0 if arg else 0.2
        u = _u01(seed ^ 0x1A65, n)
        swap = u < frac
        order = {l: _REAL_LANGS[(i + 1) % len(_REAL_LANGS)] for i, l in enumerate(_REAL_LANGS)}
        df.loc[swap, "lang"] = df.loc[swap, "lang"].map(order)
    elif name == "dup":  # duplicate n natural keys -> uniqueness violations
        k = int(arg)
        dup_rows = df.iloc[: min(k, n)].copy()
        df = pd.concat([df, dup_rows], ignore_index=True)
    elif name == "dangle":  # point n rows at nonexistent commits
        # last-k rows, so dangle_* composes with dup_* (first-k) without overlap
        k = int(arg)
        idx = df.index[max(0, n - k):]
        df.loc[idx, "commit"] = [f"dead{int(i):08x}" for i in idx]
    elif name == "nullify":  # null out content
        pct = float(arg) / 100.0
        u = _u01(seed ^ 0x9011, n)
        df.loc[u < pct, "content"] = None
    else:
        raise ValueError(f"unknown distortion {distortion!r}")
    return df


def corpus_hists(pdf: pd.DataFrame) -> dict[str, np.ndarray]:
    """Whole-corpus distribution triple (byte/len/lang) — the pure-
    numpy local analog of the Spark histogram build, used by the
    golden-corpus harness and stage-wise kernel tests as the
    single-machine oracle (the role C++ butteraugli_main played for
    the reference's reference_data.rs)."""
    present = pdf["content"].dropna()
    bh = np.zeros(256)
    for c in present:
        bh += np.bincount(
            np.frombuffer(c.encode("utf-8", "replace"), dtype=np.uint8), minlength=256
        )
    lens = present.str.len().to_numpy()
    lh = np.bincount(
        np.clip(np.log2(lens + 1).astype(int), 0, 63), minlength=64
    ).astype(float)
    vc = pdf["lang"].value_counts()
    lg = np.array([float(vc.get(l, 0)) for l in LANG_VOCAB])
    return {"byte": bh, "len": lh, "lang": lg}


def make_case(case: str, n_rows: int = 2000, seed: int = SEED):
    """Regenerate (baseline, snapshot, commits) from a case name.

    Grammar: ``<generator>__<distortion>`` with double underscore,
    e.g. ``random_mid__noise_7_0.3`` (FIXTURES.md §4) — parseable like
    the reference's parse_dimensions (generators.rs:24-30).
    """
    gen, _, dist = case.partition("__")
    baseline = make_corpus(gen, n_rows=n_rows, seed=seed)
    snapshot = distort(baseline, dist or "identity", seed=seed)
    return baseline, snapshot, make_commits(baseline)
