"""FSST-style string compression (Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020), vectorized in numpy.

Model identical to the paper's: a per-chunk symbol table of at most 255
symbols, each 1..8 bytes, replacing frequent substrings with 1-token codes;
bytes not covered by a symbol remain literal tokens (the paper's escape
mechanism — here literals and codes share one dense token alphabet that is
bit-packed at ceil(log2(n_distinct_tokens)) bits, typically 9).

Symbol discovery is iterative pair-merging (the paper's generation-based
"concatenate adjacent frequent symbols" search, §4.3, expressed as single-pair
merge rounds): each round counts adjacent token pairs with one ``np.bincount``,
merges the highest-gain pair whose combined expansion is <= 8 bytes, and
rewrites the token stream with an exact vectorized greedy (for x==y pairs,
every-2nd-in-run parity; for x!=y, matches cannot overlap). No per-value
Python anywhere.

The reference has no analog — it hands text columns to parquet-mr PLAIN +
dictionary pages (ExaParquetWriterImpl.java:42); FSST is this engine's
explicit replacement for that stage on high-cardinality text.
"""

from __future__ import annotations

import numpy as np

from . import forbp
from .bitpack import bits_needed, pack_bits, unpack_bits

TOKEN_BASE = 512  # token values: 0..255 literals, 256..510 merge codes
MAX_SYMBOL_LEN = 8
MAX_SYMBOLS = 255


def _merge_pair(a: np.ndarray, x: int, y: int, code: int) -> np.ndarray:
    """Replace every non-overlapping (x, y) adjacency in token stream ``a``
    with ``code``, exact greedy left-to-right, fully vectorized."""
    cand = np.flatnonzero((a[:-1] == x) & (a[1:] == y))
    if len(cand) == 0:
        return a
    if x == y:
        # overlapping chains like x,x,x: greedy takes every 2nd candidate
        # within each run of consecutive candidate positions
        run_start = np.flatnonzero(np.diff(cand, prepend=cand[0] - 2) != 1)
        run_id = np.cumsum(
            np.isin(np.arange(len(cand)), run_start).astype(np.int64)
        ) - 1
        offset_in_run = np.arange(len(cand)) - run_start[run_id]
        cand = cand[offset_in_run % 2 == 0]
    a[cand] = code
    keep = np.ones(len(a), dtype=bool)
    keep[cand + 1] = False
    return a[keep]


def train_and_encode(
    data: np.ndarray, max_merges: int = MAX_SYMBOLS, min_gain_count: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """data (uint8) -> (merges uint32[k,2], final token stream int32)."""
    a = data.astype(np.int32)
    merges: list[tuple[int, int]] = []
    # expansion length of each token value
    len_of = np.zeros(TOKEN_BASE, dtype=np.int64)
    len_of[:256] = 1
    for t in range(max_merges):
        if len(a) < 2:
            break
        pair_ids = a[:-1] * TOKEN_BASE + a[1:]
        # exclude pairs whose merged symbol would exceed 8 bytes
        ok = (len_of[a[:-1]] + len_of[a[1:]]) <= MAX_SYMBOL_LEN
        counts = np.bincount(pair_ids[ok], minlength=TOKEN_BASE * TOKEN_BASE)
        best = int(counts.argmax())
        best_count = int(counts[best])
        if best_count < min_gain_count:
            break
        x, y = best // TOKEN_BASE, best % TOKEN_BASE
        code = 256 + len(merges)
        merges.append((x, y))
        len_of[code] = len_of[x] + len_of[y]
        a = _merge_pair(a, x, y, code)
    return np.asarray(merges, dtype=np.uint32).reshape(-1, 2), a


def expansions(merges: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Rebuild the symbol table: token value -> byte expansion.

    Returns (exp_lengths int64[256+k], exp_data uint8) — the gather table
    used by the vectorized decode.
    """
    exp: list[bytes] = [bytes([i]) for i in range(256)]
    for x, y in merges:
        exp.append(exp[int(x)] + exp[int(y)])
    lengths = np.fromiter((len(e) for e in exp), dtype=np.int64, count=len(exp))
    data = np.frombuffer(b"".join(exp), dtype=np.uint8)
    return lengths, data


TRAIN_SAMPLE_BYTES = 1 << 17  # train symbol table on a 128 KiB sample
BLOCK = 128  # lockstep tokenizer block size (symbols never cross blocks)


def _window_ints(data: np.ndarray) -> np.ndarray:
    """uint64 rolling windows: W[i] = bytes data[i:i+8] big-endian packed."""
    n = len(data)
    padded = np.zeros(n + 8, dtype=np.uint64)
    padded[:n] = data
    w = np.zeros(n, dtype=np.uint64)
    for k in range(8):
        w |= padded[k : n + k] << np.uint64(8 * (7 - k))
    return w


def apply_table(data: np.ndarray, merges: np.ndarray) -> np.ndarray:
    """Tokenize ``data`` (uint8) against the symbol table, vectorized.

    Greedy longest-match within lockstep blocks of BLOCK bytes: every block
    advances one token per round, so total gather work is O(n_tokens) and no
    Python touches individual bytes. Symbols never span a block boundary
    (falls back to shorter match / literal there) — a valid tokenization is
    all decode needs; the ratio cost is ~max_symbol_len/BLOCK.
    """
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    exp_lengths, exp_data = expansions(merges)
    exp_offs = np.concatenate(([0], np.cumsum(exp_lengths)))
    # per symbol length L: sorted packed symbol ints + their token codes
    by_len: list[tuple[int, np.ndarray, np.ndarray]] = []
    for L in range(MAX_SYMBOL_LEN, 1, -1):
        sym_ids = np.flatnonzero(exp_lengths == L)
        sym_ids = sym_ids[sym_ids >= 256]
        if len(sym_ids) == 0:
            continue
        sym_ints = np.zeros(len(sym_ids), dtype=np.uint64)
        for k in range(L):
            sym_ints |= exp_data[exp_offs[sym_ids] + k].astype(np.uint64) << np.uint64(
                8 * (8 - 1 - k)
            )
        order = np.argsort(sym_ints)
        by_len.append((L, sym_ints[order], sym_ids[order].astype(np.int32)))

    w8 = _window_ints(data)
    n_blocks = (n + BLOCK - 1) // BLOCK
    cursors = np.arange(0, n_blocks * BLOCK, BLOCK, dtype=np.int64)
    block_end = np.minimum(cursors + BLOCK, n)
    out = np.full((n_blocks, BLOCK), -1, dtype=np.int32)
    active = np.flatnonzero(cursors < block_end)
    rnd = 0
    # lockstep walk: one token per active block per round; longest-match is
    # resolved lazily at the current cursors only (O(total tokens) work)
    while len(active):
        c = cursors[active]
        rem = block_end[active] - c
        codes = data[c].astype(np.int32)  # default: literal byte token
        step = np.ones(len(c), dtype=np.int64)
        undecided = step == 1  # still literal, try symbols longest-first
        wc = w8[c]
        for L, sym_ints, sym_codes in by_len:
            cand = np.flatnonzero(undecided & (rem >= L))
            if len(cand) == 0:
                continue
            wL = wc[cand] >> np.uint64(8 * (8 - L))
            sL = sym_ints >> np.uint64(8 * (8 - L))
            idx = np.searchsorted(sL, wL)
            idx[idx == len(sL)] = 0
            hit = sL[idx] == wL
            if hit.any():
                h = cand[hit]
                codes[h] = sym_codes[idx[hit]]
                step[h] = L
                undecided[h] = False
        out[active, rnd] = codes
        cursors[active] = c + step
        active = active[cursors[active] < block_end[active]]
        rnd += 1
    flat = out.reshape(-1)
    return flat[flat >= 0]


def encode_bytes(
    lengths: np.ndarray, data: np.ndarray, max_merges: int = MAX_SYMBOLS
) -> tuple[dict[str, bytes], dict]:
    merges, _ = train_and_encode(data[:TRAIN_SAMPLE_BYTES], max_merges=max_merges)
    tokens = apply_table(data, merges)
    # dense-remap the used token values so the packed width is minimal
    used, dense = np.unique(tokens, return_inverse=True)
    width = bits_needed(len(used) - 1)
    len_sections, len_meta = forbp.encode_int(lengths.astype(np.int64))
    return {
        "merges": merges.tobytes(),
        "tokmap": used.astype(np.uint32).tobytes(),
        "tokens": pack_bits(dense.astype(np.uint64), width),
        "len": len_sections["bp"],
    }, {
        "n": int(len(lengths)),
        "n_tok": int(len(tokens)),
        "w": width,
        "n_used": int(len(used)),
        "len": len_meta,
    }


def decode_bytes(sections: dict[str, bytes], meta: dict) -> tuple[np.ndarray, np.ndarray]:
    from .dictenc import gather_bytes

    merges = np.frombuffer(sections["merges"], dtype=np.uint32).reshape(-1, 2)
    used = np.frombuffer(sections["tokmap"], dtype=np.uint32).astype(np.int64)
    dense = unpack_bits(sections["tokens"], meta["n_tok"], meta["w"]).astype(np.int64)
    tokens = used[dense]
    exp_lengths, exp_data = expansions(merges)
    _, out_data = gather_bytes(tokens, exp_lengths, exp_data)
    out_lengths = forbp.decode_int({"bp": sections["len"]}, meta["len"])
    return out_lengths, out_data
