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


TRAIN_SAMPLE_BYTES = 1 << 16  # train symbol table on a 64 KiB sample

# worker-global trained-table cache: chunks of the same column within a
# (reused) Python worker share a symbol table, retrained periodically to
# track drift. The merges still ship in every chunk payload, so decode
# never depends on this cache.
_TABLE_CACHE: dict[str, tuple[int, np.ndarray]] = {}
RETRAIN_EVERY = 16


def trained_table(
    data: np.ndarray, cache_key: str | None = None, max_merges: int = MAX_SYMBOLS
) -> np.ndarray:
    if cache_key is not None:
        entry = _TABLE_CACHE.get(cache_key)
        if entry is not None and entry[0] < RETRAIN_EVERY:
            _TABLE_CACHE[cache_key] = (entry[0] + 1, entry[1])
            return entry[1]
    merges, _ = train_and_encode(data[:TRAIN_SAMPLE_BYTES], max_merges=max_merges)
    if cache_key is not None:
        _TABLE_CACHE[cache_key] = (1, merges)
    return merges
BLOCK = 128  # lockstep tokenizer block size (symbols never cross blocks)


def _prep_tables(merges: np.ndarray):
    """Symbol lookup structures shared across segments: per-length sorted
    packed symbol ints + codes, and the 65536-entry 2-byte-prefix bitmask."""
    exp_lengths, exp_data = expansions(merges)
    exp_offs = np.concatenate(([0], np.cumsum(exp_lengths)))
    pref_mask = np.zeros(1 << 16, dtype=np.uint8)
    by_len: list[tuple[int, np.ndarray, np.ndarray]] = []
    for L in range(2, MAX_SYMBOL_LEN + 1):
        sym_ids = np.flatnonzero(exp_lengths == L)
        sym_ids = sym_ids[sym_ids >= 256]
        if len(sym_ids) == 0:
            continue
        sym_ints = np.zeros(len(sym_ids), dtype=np.uint64)
        for k in range(L):
            sym_ints |= exp_data[exp_offs[sym_ids] + k].astype(np.uint64) << np.uint64(
                8 * (L - 1 - k)
            )
        order = np.argsort(sym_ints)
        sym_ints, sym_ids = sym_ints[order], sym_ids[order]
        by_len.append((L, sym_ints, sym_ids.astype(np.int16)))
        prefixes = (sym_ints >> np.uint64(8 * (L - 2))).astype(np.uint16)
        pref_mask[prefixes] |= np.uint8(1 << (L - 2))
    return by_len, pref_mask


def _match_tables(data: np.ndarray, prep) -> tuple[np.ndarray, np.ndarray]:
    """Per-position longest-match tables: (mlen int8, mcode int16).

    The 2-byte-prefix bitmask prunes the search: only positions whose next
    two bytes prefix *some* symbol do any per-length probing. The 8-byte
    window is gathered ONCE per candidate (zero-padded tail); each length's
    lookup key derives from it by a right shift — per-(L, k) byte gathers
    were the old hot spot. All code tables are int16 (codes <= 510): half
    the memory traffic of int32, which is what 32-way concurrency punishes.
    """
    n = len(data)
    by_len, pref_mask = prep
    mlen = np.ones(n, dtype=np.int8)
    mcode = data.astype(np.int16)

    # 2-byte prefixes of all positions
    d16 = data.astype(np.uint16)
    p16 = np.zeros(n, dtype=np.uint16)
    if n >= 2:
        p16[: n - 1] = (d16[:-1] << np.uint16(8)) | d16[1:]

    has_any = pref_mask[p16] != 0
    if n >= 1:
        has_any[n - 1] = False
    cand_pos = np.flatnonzero(has_any)
    if len(cand_pos) == 0:
        return mlen, mcode
    cand_mask = pref_mask[p16[cand_pos]]
    padded = np.zeros(n + 8, dtype=np.uint64)
    padded[:n] = data
    w8 = np.zeros(len(cand_pos), dtype=np.uint64)
    for k in range(8):
        w8 <<= np.uint64(8)
        w8 |= padded[cand_pos + k]
    matched = np.zeros(len(cand_pos), dtype=bool)
    # longest length first so the first hit wins
    for L, sym_ints, sym_codes in reversed(by_len):
        sel = np.flatnonzero(
            ((cand_mask >> np.uint8(L - 2)) & np.uint8(1)).astype(bool)
            & ~matched
            & (cand_pos <= n - L)
        )
        if len(sel) == 0:
            continue
        w = w8[sel] >> np.uint64(8 * (8 - L))
        idx = np.searchsorted(sym_ints, w)
        idx[idx == len(sym_ints)] = 0
        hit = sym_ints[idx] == w
        if hit.any():
            hs = sel[hit]
            matched[hs] = True
            pos = cand_pos[hs]
            mlen[pos] = L
            mcode[pos] = sym_codes[idx[hit]]
    return mlen, mcode


SEGMENT = 1 << 19  # tokenizer segment: temporaries stay cache-resident


def apply_table(data: np.ndarray, merges: np.ndarray) -> np.ndarray:
    """Tokenize ``data`` (uint8) against the symbol table, vectorized.

    The chunk is processed in SEGMENT-byte slices so every per-position
    temporary (match tables, cursors, out buffer) stays in cache — the walk
    is gather-heavy and random gathers over multi-MB arrays amplify to a
    cacheline of DRAM traffic per token, which saturates shared memory
    bandwidth under 32-way concurrency. Segment-local gathers don't.
    """
    n = len(data)
    prep = _prep_tables(merges)
    if n <= SEGMENT:
        return _apply_segment(data, prep)
    parts = [
        _apply_segment(np.ascontiguousarray(data[s : s + SEGMENT]), prep)
        for s in range(0, n, SEGMENT)
    ]
    return np.concatenate(parts)


def _apply_segment(data: np.ndarray, prep) -> np.ndarray:
    """Greedy longest-match within lockstep blocks of BLOCK bytes. Two phases:
    (1) per-position longest-match tables, prefix-mask pruned; (2) a lockstep
    walk where every active block emits per round either one symbol token or
    its whole pending literal *run* (bulk scatter), so literal-heavy data
    doesn't pay a round per byte. Symbols never span a block boundary — a
    valid tokenization is all decode needs; ratio cost ~max_symbol_len/BLOCK.
    No per-byte Python anywhere.
    """
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.int16)
    mlen, mcode = _match_tables(data, prep)
    # next-match-position table (for literal-run skipping): one backward
    # cummin pass replaces a binary search per walk round
    nxt = np.full(n + 1, n, dtype=np.int64)
    idx = np.flatnonzero(mlen > 1)
    nxt[idx] = idx
    nxt[:n] = np.minimum.accumulate(nxt[n - 1 :: -1])[::-1]

    n_blocks = (n + BLOCK - 1) // BLOCK
    out = np.full(n_blocks * BLOCK, -1, dtype=np.int16)
    counts = np.zeros(n_blocks, dtype=np.int64)  # tokens emitted per block
    cursors = np.arange(0, n_blocks * BLOCK, BLOCK, dtype=np.int64)
    block_end = np.minimum(cursors + BLOCK, n)
    active = np.flatnonzero(cursors < block_end)
    while len(active):
        c = cursors[active]
        rem = block_end[active] - c
        mc = mlen[c].astype(np.int64)  # small per-round cursor arrays
        is_sym = (mc > 1) & (mc <= rem)
        # symbol cursors: one token each
        sym_blocks = active[is_sym]
        if len(sym_blocks):
            sc = cursors[sym_blocks]
            out[sym_blocks * BLOCK + counts[sym_blocks]] = mcode[sc]
            counts[sym_blocks] += 1
            cursors[sym_blocks] = sc + mc[is_sym]
        # literal cursors: emit the whole run up to the next match / block end
        lit_blocks = active[~is_sym]
        if len(lit_blocks):
            lc = cursors[lit_blocks]
            next_mp = nxt[np.minimum(lc + 1, n)]
            # a match at lc itself that didn't fit rem counts as literal start
            run = np.minimum(next_mp - lc, block_end[lit_blocks] - lc)
            run = np.maximum(run, 1)
            total = int(run.sum())
            # grouped-arange scatter: out positions and source positions
            ends = np.cumsum(run)
            starts_out = lit_blocks * BLOCK + counts[lit_blocks]
            adj_out = np.ones(total, dtype=np.int64)
            adj_out[0] = starts_out[0]
            if len(run) > 1:
                adj_out[ends[:-1]] = starts_out[1:] - (starts_out[:-1] + run[:-1]) + 1
            dst = np.cumsum(adj_out)
            adj_src = np.ones(total, dtype=np.int64)
            adj_src[0] = lc[0]
            if len(run) > 1:
                adj_src[ends[:-1]] = lc[1:] - (lc[:-1] + run[:-1]) + 1
            src = np.cumsum(adj_src)
            out[dst] = data[src]
            counts[lit_blocks] += run
            cursors[lit_blocks] = lc + run
        active = active[cursors[active] < block_end[active]]
    return out[out >= 0]


def encode_bytes(
    lengths: np.ndarray,
    data: np.ndarray,
    max_merges: int = MAX_SYMBOLS,
    cache_key: str | None = None,
) -> tuple[dict[str, bytes], dict]:
    merges = trained_table(data, cache_key=cache_key, max_merges=max_merges)
    tokens = apply_table(data, merges)
    # dense-remap the used token values so the packed width is minimal
    # (bincount-based: O(n), not a sort; int16 end-to-end)
    used = np.flatnonzero(np.bincount(tokens, minlength=TOKEN_BASE))
    inv = np.zeros(TOKEN_BASE, dtype=np.int16)
    inv[used] = np.arange(len(used), dtype=np.int16)
    dense = inv[tokens]
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
