"""Delta + varbyte posting compression (SURVEY.md section 4.2 item 2).

The reference stores postings as raw BSON arrays (no compression —
DBManager.java:249-263). For 10^12 turns the index must be compressed:
sorted doc ordinals are delta-encoded then varbyte-packed; position lists
are packed as [n, delta positions...] runs. Everything is vectorized numpy
(a bounded number of mask passes, max 10 for 64-bit values) — no per-value
Python loops.

Varbyte format: little-endian 7-bit groups, high bit set on the LAST byte
of each value (classic vByte as in Manning/Raghavan/Schuetze ch. 5).
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [1 << (7 * k) for k in range(1, 10)]  # 2^7, 2^14, ... 2^63


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    nb = np.ones(arr.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += arr >= t
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_nb = int(nb.max())
    for k in range(max_nb):
        sel = nb > k
        payload = (arr[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        pos = starts[sel] + k
        last = nb[sel] == k + 1
        out[pos] = payload.astype(np.uint8) | (last.astype(np.uint8) << 7)
    return out.tobytes()


def varbyte_encode_segmented(
    values: np.ndarray, seg_starts: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode ALL `values` in one vectorized pass and return
    (buffer, byte_offsets) where byte_offsets[i] is the offset of
    segment i (values[seg_starts[i]:seg_starts[i+1]]) in the buffer —
    buffer[off[i]:off[i+1]] is bit-identical to
    varbyte_encode(values[seg_starts[i]:seg_starts[i+1]]). Lets a caller
    emit thousands of per-block encodings with one encode pass plus
    cheap byte slices (indexing/blocks.py hot path)."""
    arr = np.asarray(values, dtype=np.uint64)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    if arr.size == 0:
        return b"", np.zeros(seg_starts.size + 1, dtype=np.int64)
    nb = np.ones(arr.size, dtype=np.int64)
    for t in _THRESHOLDS:
        nb += arr >= t
    ends = np.cumsum(nb)
    starts = ends - nb
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    max_nb = int(nb.max())
    for k in range(max_nb):
        sel = nb > k
        payload = (arr[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        pos = starts[sel] + k
        last = nb[sel] == k + 1
        out[pos] = payload.astype(np.uint8) | (last.astype(np.uint8) << 7)
    offsets = np.empty(seg_starts.size + 1, dtype=np.int64)
    offsets[:-1] = starts[seg_starts]
    offsets[-1] = int(ends[-1])
    return out.tobytes(), offsets


def varbyte_decode(data: bytes | np.ndarray) -> np.ndarray:
    """Decode to an int64 array (accepts bytes or a uint8 ndarray).

    Mirrors the encoder's shape: one pass per byte POSITION over the
    (shrinking) subset of values that long — values are overwhelmingly
    1-2 bytes, so this touches each byte ~once. The previous
    formulation materialized ~6 full-length int64 temporaries (per-BYTE
    group ids via cumsum + reduceat), which made the assembler's meta
    decode the hottest loop of the whole merge at 8+ cores."""
    b = (
        data
        if isinstance(data, np.ndarray)
        else np.frombuffer(data, dtype=np.uint8)
    )
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    term_pos = np.flatnonzero(b & 0x80)
    n = term_pos.size
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = term_pos[:-1] + 1
    nb = term_pos - starts + 1
    max_nb = int(nb.max())
    if max_nb == 1:  # every value fits 7 bits — one masked gather
        return (b[term_pos] & 0x7F).astype(np.int64)
    out = (b[starts] & 0x7F).astype(np.int64)
    for k in range(1, max_nb):
        sel = np.flatnonzero(nb > k)
        out[sel] |= (
            (b[starts[sel] + k] & 0x7F).astype(np.int64) << (7 * k)
        )
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    a = np.asarray(sorted_vals, dtype=np.int64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    out[1:] = np.diff(a)
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    a = np.asarray(deltas, dtype=np.int64)
    return np.cumsum(a)


def encode_doc_ids(sorted_ordinals: np.ndarray) -> bytes:
    return varbyte_encode(delta_encode(sorted_ordinals))


def decode_doc_ids(data: bytes) -> np.ndarray:
    return delta_decode(varbyte_decode(data))


def encode_positions(position_lists) -> bytes:
    """Pack per-doc position lists as [n, p0, p1-p0, p2-p1, ...] runs.
    Accepts any sequence of int array-likes; fully vectorized — the
    per-run delta and the length/value interleave are single numpy
    scatter passes, no per-doc Python."""
    n_docs = len(position_lists)
    if n_docs == 0:
        return b""
    lens = np.fromiter(
        (len(p) for p in position_lists), dtype=np.int64, count=n_docs
    )
    total = int(lens.sum())
    flat = np.empty(n_docs + total, dtype=np.int64)
    # where each run's length header lands: after all previous runs
    head_idx = np.cumsum(lens + 1) - (lens + 1)
    flat[head_idx] = lens
    if total:
        vals = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in position_lists]
        )
        deltas = np.empty_like(vals)
        deltas[0] = vals[0]
        deltas[1:] = np.diff(vals)
        run_starts = np.cumsum(lens)[:-1]
        run_starts = run_starts[run_starts < total]
        deltas[run_starts] = vals[run_starts]  # first of each run stays raw
        run_of = np.repeat(np.arange(n_docs), lens)
        flat[np.arange(total) + run_of + 1] = deltas
    return varbyte_encode(flat)


def decode_positions(data: bytes, n_docs: int) -> list[np.ndarray]:
    flat = varbyte_decode(data)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_docs):
        n = int(flat[i])
        i += 1
        out.append(np.cumsum(flat[i : i + n]))
        i += n
    return out


def encode_doc_ids_segmented(
    sorted_ordinals: np.ndarray, seg_starts: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Segmented encode_doc_ids: delta chains restart at every segment
    start (so each slice decodes standalone), one varbyte pass total."""
    a = np.asarray(sorted_ordinals, dtype=np.int64)
    seg_starts = np.asarray(seg_starts, dtype=np.int64)
    deltas = np.empty_like(a)
    if a.size:
        deltas[0] = a[0]
        deltas[1:] = np.diff(a)
        deltas[seg_starts] = a[seg_starts]
    return varbyte_encode_segmented(deltas, seg_starts)


def encode_positions_segmented(
    position_lists, seg_doc_starts: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Segmented encode_positions over MANY docs' position lists at once:
    seg_doc_starts are doc indices where segments (blocks) begin; returns
    (buffer, byte_offsets) with buffer[off[i]:off[i+1]] bit-identical to
    encode_positions(position_lists[seg_doc_starts[i]:seg_doc_starts[i+1]])
    (run-delta chains already restart per doc, so any doc boundary is a
    valid cut)."""
    n_docs = len(position_lists)
    if n_docs == 0:
        seg_doc_starts = np.asarray(seg_doc_starts, dtype=np.int64)
        return b"", np.zeros(seg_doc_starts.size + 1, dtype=np.int64)
    lens = np.fromiter(
        (len(p) for p in position_lists), dtype=np.int64, count=n_docs
    )
    vals = (
        np.concatenate([np.asarray(p, dtype=np.int64) for p in position_lists])
        if int(lens.sum())
        else np.empty(0, dtype=np.int64)
    )
    return encode_positions_flat_segmented(lens, vals, seg_doc_starts)


def encode_positions_flat_segmented(
    lens: np.ndarray, vals: np.ndarray, seg_doc_starts: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """encode_positions_segmented on pre-flattened input: per-doc list
    lengths + concatenated values — exactly the layout an Arrow ListArray
    already stores (flatten() + list_value_length), so callers reading
    postings via mapInArrow skip the per-doc Python materialization
    entirely. Bit-identical to the list-of-lists form."""
    n_docs = len(lens)
    seg_doc_starts = np.asarray(seg_doc_starts, dtype=np.int64)
    if n_docs == 0:
        return b"", np.zeros(seg_doc_starts.size + 1, dtype=np.int64)
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    flat = np.empty(n_docs + total, dtype=np.int64)
    head_idx = np.cumsum(lens + 1) - (lens + 1)
    flat[head_idx] = lens
    if total:
        vals = np.asarray(vals, dtype=np.int64)
        deltas = np.empty_like(vals)
        deltas[0] = vals[0]
        deltas[1:] = np.diff(vals)
        run_starts = np.cumsum(lens)[:-1]
        run_starts = run_starts[run_starts < total]
        deltas[run_starts] = vals[run_starts]
        run_of = np.repeat(np.arange(n_docs), lens)
        flat[np.arange(total) + run_of + 1] = deltas
    return varbyte_encode_segmented(flat, head_idx[seg_doc_starts])


def decode_doc_ids_many(blobs) -> list[np.ndarray]:
    """Decode MANY independent delta+varbyte buffers (one per posting) in
    one vectorized pass: the buffers are concatenated (varbyte is
    self-delimiting — the high bit marks each value's last byte, so
    concatenated streams decode to concatenated values), decoded with a
    single varbyte pass, and the per-buffer delta chains are restored by
    a segmented cumsum (global cumsum minus each segment's preceding
    prefix). Returns one int64 array per input buffer — bit-identical to
    [decode_doc_ids(b) for b in blobs] with no per-value Python. This is
    the phrase path's batch decoder (a per-row lambda over 10^5 postings
    was the round-4 q_phrase regression)."""
    n = len(blobs)
    if n == 0:
        return []
    byte_lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n)
    buf = b"".join(blobs)
    deltas = varbyte_decode(buf)
    if deltas.size == 0:
        return [np.empty(0, dtype=np.int64) for _ in range(n)]
    # values per buffer = count of last-value bytes (high bit set) in it
    all_bytes = np.frombuffer(buf, dtype=np.uint8)
    last_prefix = np.concatenate(
        ([0], np.cumsum((all_bytes & 0x80) != 0, dtype=np.int64))
    )
    byte_ends = np.cumsum(byte_lens)
    counts = last_prefix[byte_ends] - last_prefix[byte_ends - byte_lens]
    starts = np.cumsum(counts) - counts
    # global cumsum, then subtract the prefix that leaked across each
    # buffer boundary — restores the per-buffer delta chains
    cs = np.cumsum(deltas)
    corr = np.where(starts > 0, cs[np.maximum(starts, 1) - 1], 0)
    vals = cs - np.repeat(corr, counts)
    return np.split(vals, starts[1:])


def encode_tfs(tfs: np.ndarray) -> bytes:
    return np.asarray(tfs, dtype=np.float64).tobytes()


def decode_tfs(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype=np.float64)


def split_varbyte_stream(
    region: bytes | np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Byte offsets cutting a concatenated varbyte stream into items of
    `counts[i]` values each: returns int64 offsets (len = len(counts)+1)
    with region[off[i]:off[i+1]] containing exactly counts[i] encoded
    values. Varbyte is self-delimiting (high bit on each value's last
    byte), so the cut points are positions of the cumulative
    counts[0..i]-th terminator — one mask + cumsum pass, no per-item
    Python. Inverse of concatenating per-item varbyte_encode outputs."""
    b = (
        region
        if isinstance(region, np.ndarray)
        else np.frombuffer(region, dtype=np.uint8)
    )
    counts = np.asarray(counts, dtype=np.int64)
    n = counts.size
    out = np.zeros(n + 1, dtype=np.int64)
    if n == 0 or b.size == 0:
        return out
    term_pos = np.flatnonzero((b & 0x80) != 0)
    cum = np.cumsum(counts)
    # a leading run of zero counts has cum == 0; term_pos[-1] would wrap
    # to the LAST terminator — those cuts stay at offset 0 (empty items)
    nz = cum > 0
    out[1:][nz] = term_pos[cum[nz] - 1] + 1
    return out


def decode_doc_ids_region(
    region: bytes | np.ndarray, byte_offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """decode_doc_ids_many over a pre-concatenated region: the buffers
    are region[off[i]:off[i+1]]. Returns (values, value_offsets) —
    segment i's decoded values are values[voff[i]:voff[i+1]], with each
    segment's delta chain restored. Zero per-segment Python."""
    b = (
        region
        if isinstance(region, np.ndarray)
        else np.frombuffer(region, dtype=np.uint8)
    )
    byte_offsets = np.asarray(byte_offsets, dtype=np.int64)
    n = byte_offsets.size - 1
    if b.size == 0:
        return np.empty(0, np.int64), np.zeros(n + 1, np.int64)
    deltas = varbyte_decode(b)
    last_prefix = np.concatenate(
        ([0], np.cumsum((b & 0x80) != 0, dtype=np.int64))
    )
    voff = last_prefix[byte_offsets]
    counts = np.diff(voff)
    starts = voff[:-1]
    cs = np.cumsum(deltas)
    corr = np.where(starts > 0, cs[np.maximum(starts, 1) - 1], 0)
    vals = cs - np.repeat(corr, counts)
    return vals, voff
