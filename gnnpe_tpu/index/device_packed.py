"""Device-resident packed dominance index with fused sharded search.

The host ``PackedDominanceIndex`` (index/packed.py) proved the packed
block layout semantically equal to the R*-tree walk; its search,
however, is a per-query Python loop with host gathers — wrong shape for
batched serving and for sharding (VERDICT r1).  This module puts the
same structure ON DEVICE and fuses the whole search into two jit'd
shard_map dispatches:

  phase 1 — block mask: bool[Q, NB] vectorized compare of every query
    path against every block summary (the internal-node pruning of
    custom.h:439-484 + the aux degree bound, all blocks at once).
  phase 2 — leaf pass: the union of surviving blocks (selected on
    host from the tiny [Q, NB] mask, bucketed to a power of two) is
    gathered on device and the exact position-wise leaf test
    (custom.h:410-434) runs as ONE masked compare over [Q, K·B]
    entries — K·B ≪ P is where the index pays off: HBM traffic drops
    by the block survival ratio.

All dominance decisions are bit-exact f64 via three-limb f32 compares
(match.device_filter.split3/ge3), so candidate sets equal the f64 host
filter exactly — PE parity counts included.

Sharding: blocks are split contiguously across the mesh axis; each
device gathers ITS surviving blocks (per-shard selection lists padded
to a common bucket).  The union is either the concatenated leaf mask
(host extraction) or the per-shard vertex bitmap + psum-OR collective,
mirroring parallel/query.py.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import numpy as np

from gnnpe_tpu.match.filter import eps_threshold as _eps_threshold

# Finite sentinels for pad blocks (±inf limb-splits to nan and warns;
# ±3e38 is still outside every real embedding magnitude).
_POS = np.float64(3e38)
_NEG = np.float64(-3e38)

from gnnpe_tpu.match.device_filter import (extract_candidates, ge3,
                                           pe_mask_device_exact,
                                           pge_mask_device_exact, split3)


def _bucket(n: int, lo: int = 1) -> int:
    """Next power of two ≥ n (≥ lo).  Shapes bucket so each distinct
    bucket compiles once; the K floor below collapses small-query
    variety into one compiled shape."""
    return max(lo, 1 << max(0, (n - 1).bit_length()))


# Fixed surviving-block chunk: phase 2 always gathers exactly
# _chunk_k(nbl) blocks per dispatch and the host loops over chunks, so
# the compiled shape never depends on how many blocks a query survives
# (round-2's per-query power-of-two K caused a fresh ~10-40 s relay
# compile on nearly every dblp query — the 42 s online p50).  The
# chunk scales with the index — nbl/64, clamped to [64, 1024] — so a
# dblp-sized index (262k blocks) doesn't pay dozens of ~40 ms relay
# dispatches per heavy query (the round-3 5.5 s p90).
# K ceiling measured on-chip (round 4, dblp resident): 1024 beats
# 2048 — the bigger dispatch's extra leaf rows and 2× mask download
# cost more than the saved round trips once chunks pipeline async.
_K_CHUNK_MIN = 64
_K_CHUNK_MAX = 1024


def _chunk_k(nbl: int) -> int:
    return min(_bucket(nbl),
               max(_K_CHUNK_MIN, min(_K_CHUNK_MAX,
                                     _bucket(max(1, nbl // 64)))))


def _pack_mask(m):
    """Device: bool[Q, R] → uint32[Q, R//32] bitmap when 32 | R (the
    production block sizes guarantee it), identity otherwise (tiny
    test indexes).  Leaf masks travel device→host through a ~28 MB/s
    relay pipe; at the synth100m rung an unpacked bool chunk is ~4 MB
    (~150 ms) per dispatch — packed, ~131 KB."""
    import jax.numpy as jnp
    q, r = m.shape
    if r % 32:
        return m
    bits = m.reshape(q, r // 32, 32).astype(jnp.uint32)
    return (bits << jnp.arange(32, dtype=jnp.uint32)).sum(-1,
                                                          dtype=jnp.uint32)


def _pack_or(acc, out, axis):
    """Kernel tail shared by every bitmap-union variant: psum the
    per-shard [nq, V] scatter across the mesh, pack to a uint32
    bitmap, and OR into the running accumulator.  The accumulator —
    and hence the one download per query/stack — is [nq, ceil(V/32)]
    uint32: 32× smaller than the int32 bitmap ADVICE r4 item 4
    measured at tens of MB per chunk."""
    import jax
    import jax.numpy as jnp
    tot = jax.lax.psum(out, axis)
    nq, v = tot.shape
    pad = (-v) % 32
    bits = jnp.pad(tot > 0, ((0, 0), (0, pad))).reshape(nq, -1, 32)
    packed = (bits.astype(jnp.uint32)
              << jnp.arange(32, dtype=jnp.uint32)).sum(
                  -1, dtype=jnp.uint32)
    return acc | packed


def _bitmap_words(v: int) -> int:
    return -(-v // 32)


def _unpack_mask(packed: np.ndarray, q: int) -> np.ndarray:
    """Host inverse of _pack_mask → bool[q, R]."""
    p = np.asarray(packed)[:q]
    if p.dtype != np.uint32:
        return p.astype(bool)
    m8 = np.ascontiguousarray(p).view(np.uint8)
    return np.unpackbits(m8, axis=1, bitorder="little").astype(bool)


def _pad_to(arr: np.ndarray, rows: int, fill) -> np.ndarray:
    pad = rows - len(arr)
    if pad <= 0:
        return arr
    return np.concatenate(
        [arr, np.full((pad,) + arr.shape[1:], fill, arr.dtype)])


def _outward(x: np.ndarray, up: bool, pad_rows: int = 0) -> np.ndarray:
    """Conservatively-rounded f32 copy of an f64 table (outward nudge)
    + optional zero pad rows."""
    u = x.astype(np.float32)
    if up:
        bump = u.astype(np.float64) < x
        u[bump] = np.nextafter(u[bump], np.float32("inf"))
    else:
        bump = u.astype(np.float64) > x
        u[bump] = np.nextafter(u[bump], np.float32("-inf"))
    if pad_rows:
        u = np.concatenate(
            [u, np.zeros((pad_rows, x.shape[1]), np.float32)])
    return u


def sig_radix_of(vertices) -> int:
    """Radix of the label-signature fold — one definition shared by the
    index build and the query-side signature (path_sig)."""
    return int(vertices.labels.max(initial=0)) + 3


def path_sig(labels_rows: np.ndarray, sig_radix: int) -> np.ndarray:
    """int64[N] label signature of each row of int[N, L] per-position
    labels — the EXACT fold composite_sort_key uses, so equal label
    vectors always produce equal signatures (collisions from the 2^30
    wrap only ever ADD candidates block ranges, never drop them)."""
    sig = np.zeros(len(labels_rows), np.int64)
    r = np.int64(sig_radix)
    for j in range(labels_rows.shape[1]):
        sig = ((sig * r + (labels_rows[:, j].astype(np.int64) + 2))
               & ((1 << 30) - 1))
    return sig


def key_tables(vertices):
    """Precomputed per-vertex tables for composite_sort_key — hoist out
    of chunk loops: recomputing the outward-rounded vde copy is an
    O(V·D) nextafter pass PER CALL, which at the synth100m rung's 1220
    chunks was ~all of the recorded 903 s 'enumeration' time."""
    return (_outward(vertices.vde, True),
            np.int64(sig_radix_of(vertices)),
            vertices.labels.astype(np.int64))


def composite_sort_key(paths: np.ndarray, vertices,
                       tables=None) -> np.ndarray:
    """int64[P] index sort key: (label signature mod 2^30) << 32 |
    order-preserving bits of -Σpde f32.  Pure host numpy — chunkable,
    GIL-releasing, and independent across path chunks, which is what
    lets the pipelined offline stage overlap key computation with
    enumeration (paths/pipeline.py).  The key shapes block quality
    only, never correctness — EXCEPT that the high 32 bits (the label
    signature) also drive the per-query contiguous block-range prune
    (DevicePackedPESearch.search), which is conservative by the
    path_sig collision argument.

    ``tables``: optional key_tables(vertices) result; pass it when
    calling per chunk (see key_tables on why)."""
    p, l = paths.shape
    vde_up, sig_radix, lab_all = (key_tables(vertices)
                                  if tables is None else tables)
    sig = np.zeros(p, np.int64)
    s32 = np.zeros(p, np.float32)
    for j in range(l):
        col = paths[:, j]
        sig = (sig * sig_radix + (lab_all[col] + 2)) & ((1 << 30) - 1)
        s32 = s32 + vde_up[col].sum(axis=1)
    bi = (-s32).view(np.int32).astype(np.int64) & 0xFFFFFFFF
    u = np.where(bi >= (1 << 31), 0xFFFFFFFF - bi, bi | (1 << 31))
    return (sig << 32) | u


_PF_CACHE: dict = {}


def _compiled_permute_fold(mesh, axis: str, l: int, d: int, p_pad: int,
                           v_pad: int, ent_rows: int, b: int):
    """AOT-compiled fused (sort-permute + block-summary fold) program:
    input = the STREAMED unsorted vid buffer (ChunkUploader) + the
    order vector; output = the sorted device vid table and the four
    block-summary arrays.  Cached per shape so the prewarm thread and
    build_from_paths share one executable (compile + remote program
    load paid during enumeration, not on the build critical path)."""
    key = (mesh, axis, l, d, p_pad, v_pad, ent_rows, b)
    if key in _PF_CACHE:
        return _PF_CACHE[key]
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    nb_pad = ent_rows // b

    def pf(buf, ordpad, sent, labv, degv, vde_up_t, x_up_t, x_dn_t):
        g = jnp.take(buf, jnp.maximum(ordpad, 0), axis=1)
        vs_t = jnp.where(ordpad[None, :] >= 0, g, sent)

        def fold(table_t, op):
            gg = jnp.concatenate(
                [jnp.take(table_t, vs_t[j], axis=1)
                 for j in range(l)], axis=0)
            return op(gg.reshape(l * d, nb_pad, b), -1).T

        blk_ub = fold(vde_up_t, jnp.max)
        blk_lhi = fold(x_up_t, jnp.max)
        blk_llo = fold(x_dn_t, jnp.min)
        degp = jnp.stack([jnp.take(degv, vs_t[j]) for j in range(l)])
        blk_deg = degp.reshape(l, nb_pad, b).max(-1).T
        return vs_t, blk_ub, blk_llo, blk_lhi, blk_deg

    sds = jax.ShapeDtypeStruct
    f32, i32 = jnp.float32, jnp.int32
    compiled = jax.jit(pf).lower(
        sds((l, p_pad), i32,
            sharding=NamedSharding(mesh, P(None, axis))),
        sds((ent_rows,), i32, sharding=NamedSharding(mesh, P(axis))),
        sds((), i32),
        sds((v_pad,), i32), sds((v_pad,), i32),
        sds((d, v_pad), f32), sds((d, v_pad), f32),
        sds((d, v_pad), f32)).compile()
    _PF_CACHE[key] = compiled
    return compiled


def pe_pad_shapes(p: int, block_size: int, num_vertices: int,
                  n_shards: int, pow2: bool = True):
    """Padded shape buckets of a table-mode PE index — ONE definition
    shared by build_from_paths, the chunked uploader, and the fold
    prewarm (they must agree bit-for-bit for the overlap to pay).

    pow2=False (streamed builds): pad P to block multiples only —
    billion-entry tables can't afford a 2× power-of-two pad, and a
    streamed build's per-scale phase-1 compile amortizes over the
    query stream anyway."""
    if pow2:
        p_pad = _bucket(max(p, block_size), lo=block_size)
    else:
        p_pad = max(block_size, -(-p // block_size) * block_size)
    v_pad = _bucket(num_vertices + 1)
    nb = p_pad // block_size
    nbl = max(1, -(-nb // n_shards))
    if not pow2:
        # 32-align the per-shard block count so the phase-1 mask
        # packs to a uint32 bitmap (18 MB -> 0.6 MB per query at the
        # youtube-l2 rung's 2.3M blocks through the ~38 MB/s pipe).
        nbl = -(-nbl // 32) * 32
    return p_pad, v_pad, nb, nbl


def hbm_budget_bytes() -> float:
    """Device-resident index budget: a fraction of chip HBM (default
    16 GB — v5e — overridable via GNNPE_HBM_BYTES).  The leaf table
    must leave room for summaries, limb tables, search buffers, and
    XLA scratch, hence the 0.35 fraction."""
    import os
    hbm = float(os.environ.get("GNNPE_HBM_BYTES", 16e9))
    return 0.35 * hbm


def cache_budget_bytes() -> float:
    """HBM budget for the streamed-mode leaf-block cache (the
    reference's LRU page cache property, cache.cpp:50-110, re-landed
    in device memory — VERDICT r4 item 1).  Larger than the resident
    budget: a streamed index holds NO device leaf table, so the cache
    can take most of the chip minus summaries + per-dispatch buffers
    + XLA scratch.  Override via GNNPE_CACHE_BYTES; disable the cache
    entirely with GNNPE_STREAM_CACHE=0."""
    import os
    v = os.environ.get("GNNPE_CACHE_BYTES")
    if v is not None:
        return float(v)
    hbm = float(os.environ.get("GNNPE_HBM_BYTES", 16e9))
    return 0.55 * hbm


class DeviceChunkCache:
    """Device-resident LRU cache of streamed leaf blocks.

    Round 4's streamed mode re-created the reference's page-fetch
    pattern (blk_file.cpp:155-208) with zero caching: every query
    re-uploaded every surviving chunk through the ~38 MB/s relay pipe
    — the 35-45 s p90 tails.  The reference pairs its disk pages with
    an LRU page cache (GNN-PE/libsrc/blockfile/cache.cpp:50-110); this
    is that property with HBM as the cache medium: a fixed pool of
    per-shard block slots ([l, n·(C+1)·b] device buffer, slot C is
    scratch for upload padding), host-side OrderedDict LRU per shard,
    and only MISSES ride the pipe.  Queries share label-signature
    block runs, so inter-query locality is real; with C·b·l·4 ≈
    0.55·HBM most of a youtube/patents-scale table is cacheable.

    Correctness under async dispatch: writes donate the cache buffer,
    and the TPU executes programs in dispatch order, so a gather
    dispatched before a later chunk's fill always reads pre-fill
    contents; eviction never victimizes a block selected by the
    chunk currently being filled (``protect``)."""

    def __init__(self, mesh, axis: str, l: int, b: int, nbl: int,
                 budget_bytes: float):
        from collections import OrderedDict
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        self.mesh = mesh
        self.axis = axis
        self.l, self.b, self.nbl = l, b, nbl
        self.n = n = mesh.shape[axis]
        per_slot = b * l * 4
        c = int(budget_bytes // (n * per_slot))
        self.capacity = max(0, min(c, nbl))
        # (C+1) slots: slot C is the scratch target for upload padding.
        self.buf = jax.device_put(
            jnp.zeros((l, n * (self.capacity + 1) * b), jnp.int32),
            NamedSharding(mesh, P(None, axis)))
        self.maps = [OrderedDict() for _ in range(n)]
        self.next_free = [0] * n
        self.hits = 0
        self.misses = 0
        self._writes = {}

    def _build_write(self, u: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.b

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(None, self.axis), P(None, self.axis),
                      P(self.axis)),
            out_specs=P(None, self.axis))
        def wr(cache, rows, slots):
            cols = (slots[0][:, None] * b
                    + jnp.arange(b, dtype=jnp.int32)[None]).reshape(-1)
            return cache.at[:, cols].set(rows)

        return jax.jit(wr, donate_argnums=0)

    def _alloc(self, s: int, protect) -> int:
        if self.next_free[s] < self.capacity:
            slot = self.next_free[s]
            self.next_free[s] += 1
            return slot
        m = self.maps[s]
        # Evict LRU, skipping blocks the current chunk selects (they
        # are about to be read by this very dispatch).
        for blk in m:
            if blk not in protect:
                slot = m.pop(blk)
                return slot
        raise RuntimeError("chunk larger than cache capacity")

    def ensure(self, parts, host_vids: np.ndarray, k: int):
        """Make every block of ``parts`` (per-shard local block-id
        arrays, ≤k each) cache-resident; returns int32[n, k] slot ids
        (pads = scratch slot).  Uploads misses in one power-of-two-
        bucketed write dispatch."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        n, b, l, nbl = self.n, self.b, self.l, self.nbl
        scratch = self.capacity
        slots = np.full((n, k), scratch, np.int32)
        miss: List[list] = [[] for _ in range(n)]
        protect = [set(p.tolist()) for p in parts]
        for s, part in enumerate(parts):
            m = self.maps[s]
            for i, blk in enumerate(part.tolist()):
                got = m.get(blk)
                if got is None:
                    miss[s].append((i, blk))
                else:
                    m.move_to_end(blk)
                    slots[s, i] = got
        nmiss = sum(len(x) for x in miss)
        self.hits += sum(len(p) for p in parts) - nmiss
        self.misses += nmiss
        if nmiss == 0:
            return slots
        u = _bucket(max(len(x) for x in miss), lo=min(64, k))
        upload = np.zeros((l, n * u * b), np.int32)
        up_slots = np.full((n, u), scratch, np.int32)
        for s in range(n):
            m = self.maps[s]
            for j, (i, blk) in enumerate(miss[s]):
                slot = self._alloc(s, protect[s])
                m[blk] = slot
                slots[s, i] = slot
                up_slots[s, j] = slot
            if miss[s]:
                # One fancy-index gather per shard (slots j are laid
                # out consecutively): the per-block Python loop costs
                # ~1 min over a 1.4M-block prefill, the gather ~none.
                blks = np.fromiter((blk for _, blk in miss[s]),
                                   np.int64, len(miss[s]))
                ridx = ((s * nbl + blks)[:, None] * b
                        + np.arange(b)).reshape(-1)
                mb = len(miss[s]) * b
                upload[:, s * u * b:s * u * b + mb] = \
                    host_vids[ridx].T
        if u not in self._writes:
            self._writes[u] = self._build_write(u)
        upj = jax.device_put(
            upload, NamedSharding(self.mesh, P(None, self.axis)))
        self.buf = self._writes[u](self.buf, upj,
                                   jnp.asarray(up_slots))
        return slots

    def prefill(self, host_vids: np.ndarray, block_order=None,
                max_seconds: float = 1e9) -> int:
        """Offline prefetch: fill the cache up to capacity with the
        given global block-id order (default: index order) before any
        query runs — the upload rides the build/warm phase instead of
        the first queries' critical path.  Returns blocks loaded."""
        import time as _time
        n, nbl = self.n, self.nbl
        if block_order is None:
            block_order = np.arange(
                min(self.capacity * n, nbl * n), dtype=np.int64)
        per_shard: List[list] = [[] for _ in range(n)]
        for g in np.asarray(block_order):
            s, local = divmod(int(g), nbl)
            if len(per_shard[s]) < self.capacity \
                    and local not in self.maps[s]:
                per_shard[s].append(local)
        t0 = _time.perf_counter()
        loaded = 0
        step = 1024
        width = max(len(p) for p in per_shard) if per_shard else 0
        for lo in range(0, width, step):
            parts = [np.asarray(p[lo:lo + step], np.int64)
                     for p in per_shard]
            k = max((len(p) for p in parts), default=0)
            if k == 0:
                break
            self.ensure(parts, host_vids, _bucket(k, lo=min(64, step)))
            loaded += sum(len(p) for p in parts)
            if _time.perf_counter() - t0 > max_seconds:
                break
        # Prefilled blocks count as neither hits nor misses.
        self.hits = 0
        self.misses = 0
        return loaded


def auto_resident(p: int, l: int, block_size: int, num_vertices: int,
                  n_shards: int) -> bool:
    """Capacity model: device-resident iff the leaf vid table fits the
    per-mesh HBM budget (l·p_pad·4 bytes over n shards)."""
    p_pad, _, _, _ = pe_pad_shapes(p, block_size, num_vertices,
                                   n_shards)
    return l * p_pad * 4 <= hbm_budget_bytes() * n_shards


def _host_fold_summaries(hv: np.ndarray, vde_up: np.ndarray,
                         x_up: np.ndarray, x_dn: np.ndarray,
                         degv: np.ndarray, b: int, workers: int = 2):
    """Block summaries folded on HOST over the sorted vid table —
    the streamed-build path where the table never moves to the device
    (it would be l·P·4 bytes through a ~38 MB/s pipe).  Chunked and
    thread-parallel (numpy gathers release the GIL); layout identical
    to the device fold_all: [NB, l·d] position-major."""
    from concurrent.futures import ThreadPoolExecutor
    ent_rows, l = hv.shape
    nb_pad = ent_rows // b
    d = vde_up.shape[1]
    blk_ub = np.empty((nb_pad, l * d), np.float32)
    blk_lhi = np.empty((nb_pad, l * d), np.float32)
    blk_llo = np.empty((nb_pad, l * d), np.float32)
    blk_deg = np.empty((nb_pad, l), np.int32)
    ch = max(b, ((1 << 23) // b) * b)   # ~8M rows, block-aligned

    def work(lo):
        hi = min(lo + ch, ent_rows)
        s, e = lo // b, hi // b
        rows = hv[lo:hi]
        for j in range(l):
            col = rows[:, j]
            blk_ub[s:e, j * d:(j + 1) * d] = \
                vde_up[col].reshape(-1, b, d).max(1)
            blk_lhi[s:e, j * d:(j + 1) * d] = \
                x_up[col].reshape(-1, b, d).max(1)
            blk_llo[s:e, j * d:(j + 1) * d] = \
                x_dn[col].reshape(-1, b, d).min(1)
            blk_deg[s:e, j] = degv[col].reshape(-1, b).max(1)

    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(work, range(0, ent_rows, ch)))
    return blk_ub, blk_llo, blk_lhi, blk_deg


class ChunkUploader:
    """Streams the UNSORTED vid table to the device in fixed-shape
    chunks while enumeration still runs (VERDICT r3 item 4).

    The device↔host relay pipe moves ~38 MB/s, so the sorted-table
    device_put was the dominant index-build phase (58 s of youtube's
    64 s).  But the unsorted rows are final the moment each
    enumeration chunk's dedup finishes — so they can ride the pipe
    DURING enumeration, and the sort becomes a device-side gather
    through the (much smaller) order vector afterwards.  Fixed chunk
    shape (cs columns) → one compiled write program; offsets stay
    multiples of cs so dynamic_update_slice windows never clamp."""

    def __init__(self, mesh, l: int, p_pad: int, sentinel: int,
                 axis: str = "graph", cs: int = 1 << 23):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        cs = min(cs, p_pad)
        assert p_pad % cs == 0
        self.cs, self.l, self.p_pad = cs, l, p_pad
        self.sentinel = sentinel
        sh = NamedSharding(mesh, P(None, axis))
        self._buf = jax.device_put(
            np.full((l, p_pad), sentinel, np.int32), sh)

        def write(buf, chunk, start):
            return jax.lax.dynamic_update_slice(
                buf, chunk, (jnp.int32(0), start))

        self._write = jax.jit(write, donate_argnums=0)
        self._jnp = jnp
        self._pend: List[np.ndarray] = []
        self._npend = 0
        self._off = 0

    def feed(self, rows: np.ndarray) -> None:
        """Queue [n, l] int32 path rows; uploads drain in cs-column
        chunks (async dispatch — returns immediately)."""
        if len(rows):
            self._pend.append(rows)
            self._npend += len(rows)
        while self._npend >= self.cs:
            self._flush(self.cs)

    def _flush(self, k: int) -> None:
        take, need = [], k
        while need:
            head = self._pend[0]
            if len(head) <= need:
                take.append(head)
                need -= len(head)
                self._pend.pop(0)
            else:
                take.append(head[:need])
                self._pend[0] = head[need:]
                need = 0
        chunk = np.ascontiguousarray(
            np.concatenate(take).T.astype(np.int32))      # [l, k]
        if k < self.cs:
            chunk = np.concatenate(
                [chunk, np.full((self.l, self.cs - k), self.sentinel,
                                np.int32)], axis=1)
        self._buf = self._write(self._buf, self._jnp.asarray(chunk),
                                np.int32(self._off))
        self._npend -= k
        self._off += k

    def finish(self):
        """Flush the remainder; returns (device buf [l, p_pad], rows
        fed).  Tail [rows, p_pad) is the sentinel."""
        if self._npend:
            self._flush(min(self._npend, self.cs))
        assert self._npend == 0
        return self._buf, self._off


class DevicePackedPESearch:
    """Sharded, fused PE packed-index search (see module docstring).

    Pass a 1-device mesh for single-chip use — the shard_map collapses
    to a plain jit.  Entries must come pre-sorted from
    PackedDominanceIndex.build (label signature, then -Σpde), which
    also supplies the block summaries.

    Two storage modes:
      * array mode (this constructor): per-entry labels/degrees/limb
        arrays on device — built from the host index, used for parity.
      * table mode (:meth:`build_from_paths`): ONLY the 12-byte vids
        row is stored per entry; labels, degrees, and pde limbs are
        gathered through tiny per-vertex tables inside the leaf kernel.
        12 B/path instead of ~110 B/path — the ladder-scale layout —
        and the sort + block-summary fold run on device (the last
        host sort from VERDICT r1 item 3).  Summaries are
        conservatively-rounded f32 (outward nudge), which can only
        under-prune; the leaf test stays bit-exact f64 via the limb
        tables, so candidate sets are identical.
    """

    def __init__(self, mesh, index, axis: str = "graph",
                 base_epsilon: float = 1e-6):
        self.table_mode = False
        self._tables = None
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.axis = axis
        self.base_epsilon = base_epsilon
        self.block_size = b = index.block_size
        self.num_entries = len(index.order)
        n = mesh.shape[axis]
        nb = len(index.blk_ub)
        # Blocks per shard (+1 pad block per shard for safe selection).
        self.nb_local = nbl = max(1, -(-nb // n))
        nb_pad = n * nbl
        self.num_blocks = nb

        ent_rows = nb_pad * b
        labels = _pad_to(index.labels, ent_rows, -2)
        degrees = _pad_to(index.degrees, ent_rows, 0)
        vids = _pad_to(index.vids, ent_rows, 0)
        pde = _pad_to(index.pde, ent_rows, 0.0)

        shard = NamedSharding(mesh, P(axis))
        self.d_labels = jax.device_put(jnp.asarray(labels), shard)
        self.d_degrees = jax.device_put(jnp.asarray(degrees), shard)
        self.d_vids = jax.device_put(jnp.asarray(vids), shard)
        self.d_pde3 = tuple(jax.device_put(jnp.asarray(a), shard)
                            for a in split3(pde))

        blk_ub = _pad_to(index.blk_ub, nb_pad, _NEG)
        blk_llo = _pad_to(index.blk_label_lo, nb_pad, _POS)
        blk_lhi = _pad_to(index.blk_label_hi, nb_pad, _NEG)
        blk_deg = _pad_to(index.blk_max_deg, nb_pad, 0)
        self.b_ub3 = tuple(jax.device_put(jnp.asarray(a), shard)
                           for a in split3(blk_ub))
        self.b_llo3 = tuple(jax.device_put(jnp.asarray(a), shard)
                            for a in split3(blk_llo))
        self.b_lhi3 = tuple(jax.device_put(jnp.asarray(a), shard)
                            for a in split3(blk_lhi))
        self.b_deg = jax.device_put(jnp.asarray(blk_deg), shard)

        self._host_vids = vids            # for host-union extraction
        self.build_phase_ms = None
        self._blk_sig_first = None        # sig ranges exist in table mode
        self.streamed = False
        self.k_chunk = _chunk_k(nbl)
        self.last_stats = None
        self._num_vertices = int(vids.max(initial=0)) + 1
        self._cache = None
        self._phase1 = None
        self._phase2 = {}
        self._phase2_bitmap = {}

    @classmethod
    def build_from_paths(cls, mesh, paths: np.ndarray, vertices,
                         block_size: int = 512, axis: str = "graph",
                         base_epsilon: float = 1e-6,
                         precomputed_key=None, preuploaded=None,
                         resident: bool = True
                         ) -> "DevicePackedPESearch":
        """Hybrid index build (table mode — see class docstring).

        Division of labor (re-measured for round 3; the round-2 877 s
        yeast build was ~99% relay compile overhead, ~0.1 s compute):
          * SORT on HOST — one composite int64 key per path, (label
            signature mod 2^30) << 32 | order-preserving bits of
            -Σpde f32, through np.argsort (20 s at the dblp rung's
            6.7e7 paths).  On-device sorting is a dead end through the
            relay: the 4-key lexsort comparator compiled in ~120 s,
            int64 keys EXECUTE ~3000× slower on v5e's 32-bit compare
            units (301 s vs 0.11 s at 2^19 rows), and even a cached
            int32 sort program pays a 40-300 s remote load lottery on
            first execution per process.  The key only shapes block
            quality, never correctness.
          * FOLD on DEVICE — block summaries are pure gathers+
            reductions over the sorted vid table (a small program:
            ~1.3 s compile, fast load), and the sorted table must be
            uploaded anyway since it IS the leaf-phase storage.
          * P and V are padded to power-of-two buckets so every rung /
            rerun with similar scale reuses the same compiled shape,
            and the persistent compilation cache is enabled so each
            shape compiles once per machine, not once per process.

        Layout: every O(P)-row array is TRANSPOSED — [l, P] vids,
        [l·d, P] embedding gathers — because TPU tiling pads the
        minor dimension to 128 lanes: an s32[P, 3] at the dblp rung
        (P = 6.1e7) would tile to 31 GB (measured OOM), while
        s32[3, P] tiles to ~0.73 GB.  Only per-block summaries
        ([NB, l·d], NB ≈ P/512) keep row-major layout.

        Phase timings land in ``self.build_phase_ms``.
        """
        import time as _time
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from gnnpe_tpu.utils.compile_cache import enable_persistent_cache
        enable_persistent_cache()

        self = cls.__new__(cls)
        self.table_mode = True
        self.streamed = not resident
        self.mesh = mesh
        self.axis = axis
        self.base_epsilon = base_epsilon
        self.block_size = b = block_size
        assert b & (b - 1) == 0, f"block_size must be a power of 2: {b}"
        v = vertices.num_vertices
        d = vertices.dim
        p, l = paths.shape
        self.num_entries = p
        n = mesh.shape[axis]
        # Shape buckets: pad the path count to a power of two ≥ b and
        # the vertex tables likewise, so compiled shapes are shared
        # across datasets of similar scale and across runs.  Streamed
        # builds (the table NEVER moves to device — the HBM-wall mode,
        # VERDICT r3 item 1) pad to block multiples only.
        p_pad, v_pad, nb, nbl = pe_pad_shapes(p, b, v, n, pow2=resident)
        self.nb_local = nbl
        nb_pad = n * nbl
        self.num_blocks = nb
        ent_rows = nb_pad * b
        # Streamed phase-2 dispatches upload K·B·l·4 bytes each; the
        # _chunk_k ceiling (1024 blocks ≈ 6 MB at l=3) amortizes the
        # ~40 ms dispatch + ~165 ms transfer per round trip.
        self.k_chunk = _chunk_k(nbl)

        t0 = _time.perf_counter()

        # Conservative f32 value tables (outward-rounded); rows
        # [v, v_pad) are the sentinel (label -2, degree 0, vde 0).
        # All tables stay HOST numpy here and are passed to jits as
        # ARGUMENTS (or closured as numpy): lowering a jaxpr whose
        # constants are committed *device* arrays takes minutes through
        # the relay (measured 146 s for one closured 16 KB take table;
        # 0.2 s as an argument).
        vde_up = _outward(vertices.vde, True, v_pad - v)
        x_up = _outward(vertices.x, True, v_pad - v)
        x_dn = _outward(vertices.x, False, v_pad - v)
        labv = np.concatenate(
            [vertices.labels.astype(np.int32),
             np.full(v_pad - v, -2, np.int32)])
        degv = np.concatenate(
            [vertices.degrees.astype(np.int32),
             np.zeros(v_pad - v, np.int32)])
        # Exact limb tables for the leaf test (sentinel rows = 0).
        limb_tables = tuple(
            jnp.asarray(np.concatenate(
                [a, np.zeros((v_pad - v, d), np.float32)]))
            for a in split3(vertices.vde))
        self._tables = (jnp.asarray(labv), jnp.asarray(degv)) \
            + limb_tables

        vde_up_t = np.ascontiguousarray(vde_up.T)   # [d, v_pad]
        x_up_t = np.ascontiguousarray(x_up.T)
        x_dn_t = np.ascontiguousarray(x_dn.T)
        t_tables = _time.perf_counter() - t0

        # ---- host sort: composite int64 key, one stable argsort -----
        # (Signature wraps mod 2^30 when L^l overflows — that only
        # mixes labels within blocks: wider summaries, never wrong
        # candidates.  ``precomputed_key`` lets the pipelined offline
        # stage compute chunk keys overlapped with enumeration.)
        t0 = _time.perf_counter()
        key = (composite_sort_key(paths, vertices)
               if precomputed_key is None
               else np.asarray(precomputed_key))
        assert len(key) == p, (len(key), p)
        order_h = np.argsort(key, kind="stable")
        t_sort = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        # Sorted vid table, padded with the sentinel vertex v; this is
        # both the host extraction table and (transposed) the device
        # leaf storage — no device→host fetch needed at all.
        hv = np.full((ent_rows, l), v, np.int32)
        if p > (1 << 26):
            # Billion-row builds: the permutation gather is a random-
            # access pass over ~12·p bytes at ~35 MB/s single-thread
            # (7 min at the youtube rung) — split across threads
            # (numpy fancy indexing releases the GIL).
            from concurrent.futures import ThreadPoolExecutor

            def _gather(lo_hi):
                lo, hi = lo_hi
                hv[lo:hi] = paths[order_h[lo:hi]]
            step = -(-p // 4)
            spans = [(i, min(i + step, p))
                     for i in range(0, p, step)]
            with ThreadPoolExecutor(max_workers=2) as pool:
                list(pool.map(_gather, spans))
        else:
            hv[:p] = paths[order_h]
        self._host_vids = hv
        # (The transposed host copy is only needed when the table is
        # uploaded whole — the streamed path permutes on device.)
        vs_t_h = (np.ascontiguousarray(hv.T)
                  if preuploaded is None else None)
        # Per-block label-signature range (the sort's PRIMARY key, so
        # blocks are sig-sorted and a query path's exact-label matches
        # live in ONE contiguous block run — searchsorted per query
        # prunes every other block before phase 2; VERDICT r3 item 5).
        sig_sorted = key[order_h] >> 32
        self._sig_radix = sig_radix_of(vertices)
        nb_real = -(-p // b)
        blk_first = np.full(nb_pad, np.int64(1) << 62, np.int64)
        blk_last = np.full(nb_pad, np.int64(1) << 62, np.int64)
        blk_first[:nb_real] = sig_sorted[np.arange(nb_real) * b]
        blk_last[:nb_real] = sig_sorted[
            np.minimum(np.arange(1, nb_real + 1) * b, p) - 1]
        self._blk_sig_first = blk_first
        self._blk_sig_last = blk_last
        self.last_stats = None
        t_host = _time.perf_counter() - t0

        # ---- device fold: block summaries (small program) -----------
        def fold_all(vs_t, labv, degv, vde_up_t, x_up_t, x_dn_t):
            def fold(table_t, op):
                # concat per-position gathers → [l·d, ent_rows], fold
                # blocks of b → [nb_pad, l·d] (small, row-major OK).
                g = jnp.concatenate(
                    [jnp.take(table_t, vs_t[j], axis=1)
                     for j in range(l)], axis=0)
                return op(g.reshape(l * d, nb_pad, b), -1).T

            blk_ub = fold(vde_up_t, jnp.max)
            blk_lhi = fold(x_up_t, jnp.max)
            blk_llo = fold(x_dn_t, jnp.min)
            degp = jnp.stack([jnp.take(degv, vs_t[j])
                              for j in range(l)])     # [l, ent_rows]
            blk_deg = degp.reshape(l, nb_pad, b).max(-1).T
            return blk_ub, blk_llo, blk_lhi, blk_deg

        vids_sharding = NamedSharding(mesh, P(None, axis))
        if not resident:
            # ---- streamed build: summaries folded on HOST, table
            # stays host-resident (the reference's disk-paged R-tree
            # property — blk_file.cpp:22-62 — re-landed as
            # host-RAM-paged leaves: phase 2 uploads only surviving
            # chunks, so index size is bounded by host RAM, not HBM).
            t0 = _time.perf_counter()
            blk_ub, blk_llo, blk_lhi, blk_deg = _host_fold_summaries(
                hv, vde_up, x_up, x_dn, degv, b)
            t_compile = 0.0
            self.d_vids = None
            self.d_labels = self.d_degrees = self.d_pde3 = None
        elif preuploaded is not None:
            # Streamed-build path (VERDICT r3 item 4): the UNSORTED
            # vid table already lives on device (ChunkUploader fed it
            # during enumeration), so the only transfer left on the
            # critical path is the order vector — 1/l of the table
            # bytes — and the sort-permute runs as a device gather
            # fused with the summary fold.
            buf, fed = preuploaded
            assert fed == p and buf.shape == (l, p_pad), \
                (fed, p, buf.shape, (l, p_pad))
            t0 = _time.perf_counter()
            compiled_pf = _compiled_permute_fold(
                mesh, axis, l, d, p_pad, v_pad, ent_rows, b)
            t_compile = _time.perf_counter() - t0

            t0 = _time.perf_counter()
            ordpad = np.full(ent_rows, -1, np.int32)
            ordpad[:p] = order_h
            ord_d = jax.device_put(ordpad,
                                   NamedSharding(mesh, P(axis)))
            vs_dev, blk_ub, blk_llo, blk_lhi, blk_deg = compiled_pf(
                buf, ord_d, np.int32(v), labv, degv,
                vde_up_t, x_up_t, x_dn_t)
            self.d_vids = vs_dev
            self.d_labels = self.d_degrees = self.d_pde3 = None
        else:
            t0 = _time.perf_counter()
            sds = lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype)
            compiled = jax.jit(fold_all).lower(
                jax.ShapeDtypeStruct(vs_t_h.shape, vs_t_h.dtype,
                                     sharding=vids_sharding),
                sds(labv), sds(degv), sds(vde_up_t),
                sds(x_up_t), sds(x_dn_t)).compile()
            t_compile = _time.perf_counter() - t0

            t0 = _time.perf_counter()
            # vids stored transposed [l, ent_rows], sharded on the row
            # (entry) axis — see layout note in the docstring.
            self.d_vids = jax.device_put(vs_t_h, vids_sharding)
            blk_ub, blk_llo, blk_lhi, blk_deg = compiled(
                self.d_vids, labv, degv, vde_up_t, x_up_t, x_dn_t)
            self.d_labels = self.d_degrees = self.d_pde3 = None
        # Single-f32 conservative summaries as (value, 0, 0) limbs.
        # ONE shared zero buffer serves all six zero-limb slots (they
        # are read-only phase-1 inputs): separate allocations cost
        # ~1.2 GB of HBM at the 8.2M-block youtube_skew rung.
        shard = NamedSharding(mesh, P(axis))
        put = lambda a: jax.device_put(a, shard)
        z0 = put(jnp.zeros_like(blk_ub))
        self.b_ub3 = (put(blk_ub), z0, z0)
        self.b_llo3 = (put(blk_llo), z0, z0)
        self.b_lhi3 = (put(blk_lhi), z0, z0)
        self.b_deg = put(blk_deg)
        # Force materialization so the recorded time is honest (the
        # relay's block_until_ready does not actually block).
        float(self.b_deg[0, 0])
        t_fold = _time.perf_counter() - t0
        self.build_phase_ms = {
            "tables": round(t_tables * 1e3, 1),
            "host_sort": round(t_sort * 1e3, 1),
            "host_vids": round(t_host * 1e3, 1),
            "compile": round(t_compile * 1e3, 1),
            "upload_fold": round(t_fold * 1e3, 1),
        }
        self._num_vertices = v
        self._cache = None
        self._phase1 = None
        self._phase2 = {}
        self._phase2_bitmap = {}
        return self

    def save(self, path: str) -> None:
        """Persist a table/streamed-mode index: the host sorted vid
        table, the (small) block summaries pulled off device, and the
        sig ranges — everything needed to re-serve without the
        enumerate/sort/fold build (30 min at the youtube-l2 rung).
        The reference's analogue is its index.dat reload
        (custom.h:218-234); per-vertex tables are NOT stored — they
        rebuild from the embeddings in seconds at load.

        Tables beyond 1 GB (and memmap-backed disk-tier tables) land
        in a raw ``<path>.vids.bin`` sidecar, copied in bounded
        chunks — np.savez would buffer the whole multi-GB array."""
        assert self.table_mode, "save() is for table/streamed modes"
        hv = self._host_vids
        big = isinstance(hv, np.memmap) or hv.nbytes > (1 << 30)
        extra = {}
        if big:
            step = (1 << 26) // hv.shape[1]
            with open(path + ".vids.bin", "wb") as f:
                for lo in range(0, len(hv), step):
                    f.write(np.ascontiguousarray(
                        hv[lo:lo + step]).tobytes())
            extra["host_vids"] = np.zeros((0, hv.shape[1]), np.int32)
        else:
            extra["host_vids"] = hv
        np.savez(path,
                 blk_ub=np.asarray(self.b_ub3[0]),
                 blk_llo=np.asarray(self.b_llo3[0]),
                 blk_lhi=np.asarray(self.b_lhi3[0]),
                 blk_deg=np.asarray(self.b_deg),
                 blk_sig_first=self._blk_sig_first,
                 blk_sig_last=self._blk_sig_last,
                 meta=np.array([self.num_entries, self.block_size,
                                self.num_blocks, self.nb_local,
                                int(self.streamed), self._sig_radix,
                                int(big), hv.shape[1]],
                               np.int64),
                 **extra)

    @classmethod
    def load(cls, mesh, path: str, vertices, axis: str = "graph",
             base_epsilon: float = 1e-6) -> "DevicePackedPESearch":
        """Reload a saved table/streamed index onto ``mesh``.  The
        mesh shard count must divide the saved block layout (save and
        load with the same mesh width)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from gnnpe_tpu.utils.compile_cache import \
            enable_persistent_cache
        enable_persistent_cache()
        z = np.load(path)
        meta = [int(x) for x in z["meta"]]
        p, b, nb, nbl, streamed, sig_radix = meta[:6]
        big = bool(meta[6]) if len(meta) > 6 else False
        self = cls.__new__(cls)
        self.table_mode = True
        self.streamed = bool(streamed)
        self.mesh = mesh
        self.axis = axis
        self.base_epsilon = base_epsilon
        self.block_size = b
        self.num_entries = p
        self.num_blocks = nb
        self.nb_local = nbl
        n = mesh.shape[axis]
        if big:
            l_saved = meta[7]
            hv = np.memmap(path + ".vids.bin", dtype=np.int32,
                           mode="r").reshape(-1, l_saved)
        else:
            hv = z["host_vids"]
        assert n * nbl * b == len(hv), \
            "mesh width differs from the one the index was saved with"
        self._host_vids = hv
        self._blk_sig_first = z["blk_sig_first"]
        self._blk_sig_last = z["blk_sig_last"]
        self._sig_radix = sig_radix
        self.k_chunk = _chunk_k(nbl)
        v = vertices.num_vertices
        d = vertices.dim
        v_pad = _bucket(v + 1)
        labv = np.concatenate(
            [vertices.labels.astype(np.int32),
             np.full(v_pad - v, -2, np.int32)])
        degv = np.concatenate(
            [vertices.degrees.astype(np.int32),
             np.zeros(v_pad - v, np.int32)])
        limb_tables = tuple(
            jnp.asarray(np.concatenate(
                [a, np.zeros((v_pad - v, d), np.float32)]))
            for a in split3(vertices.vde))
        self._tables = (jnp.asarray(labv), jnp.asarray(degv)) \
            + limb_tables
        shard = NamedSharding(mesh, P(axis))
        put = lambda a: jax.device_put(a, shard)
        # Shared zero buffer for the six zero-limb slots (see the
        # build-site note — ~1.2 GB at 8.2M blocks).
        z0 = put(np.zeros_like(z["blk_ub"]))
        self.b_ub3 = (put(z["blk_ub"]), z0, z0)
        self.b_llo3 = (put(z["blk_llo"]), z0, z0)
        self.b_lhi3 = (put(z["blk_lhi"]), z0, z0)
        self.b_deg = put(z["blk_deg"])
        if self.streamed:
            self.d_vids = None
        else:
            self.d_vids = jax.device_put(
                np.ascontiguousarray(self._host_vids.T),
                NamedSharding(mesh, P(None, axis)))
        self.d_labels = self.d_degrees = self.d_pde3 = None
        self.build_phase_ms = None
        self.last_stats = None
        self._num_vertices = v
        self._cache = None
        self._phase1 = None
        self._phase2 = {}
        self._phase2_bitmap = {}
        return self

    @staticmethod
    def prewarm_fold(mesh, l: int, d: int, p: int, num_vertices: int,
                     block_size: int = 512, axis: str = "graph"
                     ) -> None:
        """Compile AND once-execute the permute+fold program for the
        EXACT padded shapes the coming build will use, on device-made
        junk (jnp.zeros — no host transfer).  Run from a thread during
        enumeration so the compile and the relay's remote program-load
        lottery (40-300 s worst case) never sit on the build critical
        path.  p must be the exact path count (known in closed form
        for 2- and 3-vertex paths)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        n = mesh.shape[axis]
        p_pad, v_pad, nb, nbl = pe_pad_shapes(p, block_size,
                                              num_vertices, n)
        ent_rows = n * nbl * block_size
        compiled = _compiled_permute_fold(mesh, axis, l, d, p_pad,
                                          v_pad, ent_rows, block_size)
        z = lambda s, dt, spec: jax.device_put(
            jnp.zeros(s, dt), NamedSharding(mesh, spec))
        out = compiled(
            z((l, p_pad), jnp.int32, P(None, axis)),
            z((ent_rows,), jnp.int32, P(axis)),
            np.int32(0),
            np.zeros(v_pad, np.int32), np.zeros(v_pad, np.int32),
            np.zeros((d, v_pad), np.float32),
            np.zeros((d, v_pad), np.float32),
            np.zeros((d, v_pad), np.float32))
        # Force the load (readback of one scalar); discard results.
        np.asarray(out[4][:1, :1])

    # -- phase 1: block mask ------------------------------------------
    # Phase-1 block-chunk width: the limb-compare broadcasts cost
    # O(qb · chunk · l·d) scratch; unchunked at the youtube_skew rung
    # (8.2M blocks) that is several ~3 GB temps live at once — a
    # guaranteed RESOURCE_EXHAUSTED.  1M blocks × qb=16 × 6 dims keeps
    # every temp under ~400 MB while still saturating the VPU.
    _P1_CHUNK = 1 << 20

    def _build_phase1(self):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        cb = self._P1_CHUNK

        def body(ub3, llo3, lhi3, bdeg, qt3, qlbl3, qdeg):
            # dom: blk_ub >= q_pde - eps   (same threshold as the leaf)
            dom = ge3(*(a[None] for a in ub3),
                      *(a[:, None, :] for a in qt3)).all(-1)
            # label window: blk_lo <= q_pde_label <= blk_hi
            inside = (ge3(*(a[:, None, :] for a in qlbl3),
                          *(a[None] for a in llo3)) &
                      ge3(*(a[None] for a in lhi3),
                          *(a[:, None, :] for a in qlbl3))).all(-1)
            deg = (qdeg[:, None, :] <= bdeg[None]).all(-1)
            # Packed bitmap when 32 | nbl: the [Q, NB] mask is the
            # dominant device->host transfer at million-block scale.
            return _pack_mask(dom & inside & deg)

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=((P(self.axis),) * 3,) * 3 + (P(self.axis),)
            + ((P(),) * 3, (P(),) * 3, P()),
            out_specs=P(None, self.axis))
        def run(ub3, llo3, lhi3, bdeg, qt3, qlbl3, qdeg):
            nbl = bdeg.shape[0]
            if nbl <= cb:
                return body(ub3, llo3, lhi3, bdeg, qt3, qlbl3, qdeg)
            # Sequential lax.map over block chunks bounds scratch to
            # one chunk's broadcasts.  Pad the tail chunk's blk_ub hi
            # limb with the -3e38 pad sentinel (dominance false ⇒
            # packed zeros), slice the concatenation back to nbl
            # (32 | nbl at every production block size).
            nc = -(-nbl // cb)
            pad = nc * cb - nbl

            def padded(a, fill):
                if pad == 0:
                    return a.reshape((nc, cb) + a.shape[1:])
                return jnp.concatenate(
                    [a, jnp.full((pad,) + a.shape[1:], fill,
                                 a.dtype)]).reshape(
                    (nc, cb) + a.shape[1:])

            stk = ((padded(ub3[0], np.float32(_NEG)),
                    padded(ub3[1], 0), padded(ub3[2], 0))
                   + tuple(padded(a, 0) for t in (llo3, lhi3)
                           for a in t)
                   + (padded(bdeg, 0),))

            def chunk(args):
                u3 = args[0:3]
                lo3 = args[3:6]
                hi3 = args[6:9]
                bd = args[9]
                return body(u3, lo3, hi3, bd, qt3, qlbl3, qdeg)

            out = jax.lax.map(chunk, stk)          # [nc, qb, cb//32]
            qb = out.shape[1]
            return out.transpose(1, 0, 2).reshape(
                qb, -1)[:, :nbl // 32]

        return jax.jit(run)

    # -- fused single-dispatch search (small indexes) -----------------
    def _build_fused(self):
        """When every shard's blocks fit one chunk, phase 1, the host
        block selection, and the leaf pass collapse into ONE dispatch:
        the block mask computes on device and gates leaf rows directly
        (each relay round trip costs ~40 ms — on Test/yeast-scale
        indexes this halves online search latency)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.block_size

        if self.table_mode:
            @functools.partial(
                jax.shard_map, mesh=self.mesh,
                in_specs=(P(None, self.axis),
                          (P(self.axis),) * 3, (P(self.axis),) * 3,
                          (P(self.axis),) * 3, P(self.axis),
                          P(), P(), (P(),) * 3, (P(),) * 3,
                          (P(),) * 5),
                out_specs=P(None, self.axis))
            def run(dv, ub3, llo3, lhi3, bdeg, ql, qd, qt3, qlbl3,
                    tables):
                labv, degv, vh, vm, vl = tables
                dom = ge3(*(a[None] for a in ub3),
                          *(a[:, None, :] for a in qt3)).all(-1)
                inside = (ge3(*(a[:, None, :] for a in qlbl3),
                              *(a[None] for a in llo3)) &
                          ge3(*(a[None] for a in lhi3),
                              *(a[:, None, :] for a in qlbl3))).all(-1)
                degm = (qd[:, None, :] <= bdeg[None]).all(-1)
                bmask = dom & inside & degm          # [Qb, nbl]
                gv = dv.T                            # [rows, L]
                flat = gv.reshape(-1)
                gl = jnp.take(labv, flat).reshape(gv.shape)
                gd = jnp.take(degv, flat).reshape(gv.shape)
                gp3 = tuple(
                    jnp.take(t, flat, axis=0).reshape(gv.shape[0], -1)
                    for t in (vh, vm, vl))
                m = pe_mask_device_exact(gl, gd, gp3, ql, qd, qt3)
                gate = jnp.repeat(bmask, b, axis=1,
                                  total_repeat_length=gv.shape[0])
                return _pack_mask(m & gate)
        else:
            @functools.partial(
                jax.shard_map, mesh=self.mesh,
                in_specs=(P(self.axis), P(self.axis),
                          (P(self.axis),) * 3,
                          (P(self.axis),) * 3, (P(self.axis),) * 3,
                          (P(self.axis),) * 3, P(self.axis),
                          P(), P(), (P(),) * 3, (P(),) * 3),
                out_specs=P(None, self.axis))
            def run(dl, dd, dp3, ub3, llo3, lhi3, bdeg, ql, qd, qt3,
                    qlbl3):
                dom = ge3(*(a[None] for a in ub3),
                          *(a[:, None, :] for a in qt3)).all(-1)
                inside = (ge3(*(a[:, None, :] for a in qlbl3),
                              *(a[None] for a in llo3)) &
                          ge3(*(a[None] for a in lhi3),
                              *(a[:, None, :] for a in qlbl3))).all(-1)
                degm = (qd[:, None, :] <= bdeg[None]).all(-1)
                bmask = dom & inside & degm
                m = pe_mask_device_exact(dl, dd, dp3, ql, qd, qt3)
                gate = jnp.repeat(bmask, b, axis=1,
                                  total_repeat_length=dl.shape[0])
                return _pack_mask(m & gate)

        return jax.jit(run)

    # -- phase 2: gathered leaf pass ----------------------------------
    def _build_phase2(self, k: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.block_size

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis),
                      (P(self.axis),) * 3, P(self.axis),
                      P(self.axis), P(self.axis),
                      P(), P(), (P(),) * 3),
            out_specs=P(None, self.axis))
        def run(dl, dd, dp3, dv, sel, bqm, ql, qd, qt3):
            # sel: int32[1, K] local surviving block ids (local index);
            # bqm: bool[1, K, Qb] per-(block, query) survival.
            rows = (sel[0][:, None] * b
                    + jnp.arange(b, dtype=jnp.int32)[None]).reshape(-1)
            gl = jnp.take(dl, rows, axis=0)
            gd = jnp.take(dd, rows, axis=0)
            gp3 = tuple(jnp.take(a, rows, axis=0) for a in dp3)
            m = pe_mask_device_exact(gl, gd, gp3, ql, qd, qt3)
            gate = jnp.repeat(bqm[0].T, b, axis=1,
                              total_repeat_length=rows.shape[0])
            return _pack_mask(m & gate)

        return jax.jit(run)

    def _build_phase2_tbl(self, k: int):
        # Vertex tables are ARGUMENTS (replicated specs), never jit
        # closures: closured device arrays cost minutes to lower
        # through the relay (see build_from_paths).
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.block_size

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(None, self.axis), P(self.axis), P(self.axis),
                      P(), P(), (P(),) * 3, (P(),) * 5),
            out_specs=P(None, self.axis))
        def run(dv, sel, bqm, ql, qd, qt3, tables):
            labv, degv, vh, vm, vl = tables
            rows = (sel[0][:, None] * b
                    + jnp.arange(b, dtype=jnp.int32)[None]).reshape(-1)
            gv = jnp.take(dv, rows, axis=1).T        # [K·B, L]
            flat = gv.reshape(-1)
            gl = jnp.take(labv, flat).reshape(gv.shape)
            gd = jnp.take(degv, flat).reshape(gv.shape)
            gp3 = tuple(
                jnp.take(t, flat, axis=0).reshape(gv.shape[0], -1)
                for t in (vh, vm, vl))
            m = pe_mask_device_exact(gl, gd, gp3, ql, qd, qt3)
            gate = jnp.repeat(bqm[0].T, b, axis=1,
                              total_repeat_length=rows.shape[0])
            return _pack_mask(m & gate)

        return jax.jit(run)

    def _build_phase2_stream(self, k: int):
        """Streamed leaf pass: the chunk's vid rows arrive as an INPUT
        (host-gathered from the RAM-resident sorted table and uploaded
        per dispatch) — the device never holds the full leaf table.
        This is what removes the HBM ceiling on index size (the
        reference's analogue is the page-on-demand R-tree read,
        blk_file.cpp:155-208)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.block_size

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis),
                      P(), P(), (P(),) * 3, (P(),) * 5),
            out_specs=P(None, self.axis))
        def run(gvs, bqm, ql, qd, qt3, tables):
            labv, degv, vh, vm, vl = tables
            gv = gvs                                 # [K·B, L] local
            flat = gv.reshape(-1)
            gl = jnp.take(labv, flat).reshape(gv.shape)
            gd = jnp.take(degv, flat).reshape(gv.shape)
            gp3 = tuple(
                jnp.take(t, flat, axis=0).reshape(gv.shape[0], -1)
                for t in (vh, vm, vl))
            m = pe_mask_device_exact(gl, gd, gp3, ql, qd, qt3)
            gate = jnp.repeat(bqm[0].T, b, axis=1,
                              total_repeat_length=gv.shape[0])
            return _pack_mask(m & gate)

        return jax.jit(run)

    def _build_phase2_bitmap_tbl(self, k: int, num_vertices: int,
                                 l: int, nq: int):
        """Bitmap-union leaf pass with DEVICE accumulation: ``acc``
        (the running [nq, V] union, donated) ORs with this chunk's
        psum'd bitmap, so the host downloads ONE bitmap per query, not
        one per chunk (ADVICE r4 item 4 — per-chunk downloads were
        ~4·nq·V bytes through the ~38 MB/s relay pipe, each)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.block_size
        axis = self.axis

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(), P(None, axis), P(axis), P(axis),
                      P(), P(), (P(),) * 3, P(), (P(),) * 5),
            out_specs=P())
        def run(acc, dv, sel, bqm, ql, qd, qt3, qv, tables):
            labv, degv, vh, vm, vl = tables
            rows = (sel[0][:, None] * b
                    + jnp.arange(b, dtype=jnp.int32)[None]).reshape(-1)
            gv = jnp.take(dv, rows, axis=1).T
            flat = gv.reshape(-1)
            gl = jnp.take(labv, flat).reshape(gv.shape)
            gd = jnp.take(degv, flat).reshape(gv.shape)
            gp3 = tuple(
                jnp.take(t, flat, axis=0).reshape(gv.shape[0], -1)
                for t in (vh, vm, vl))
            m = pe_mask_device_exact(gl, gd, gp3, ql, qd, qt3)
            gate = jnp.repeat(bqm[0].T, b, axis=1,
                              total_repeat_length=rows.shape[0])
            m = m & gate
            out = jnp.zeros((nq, num_vertices), dtype=jnp.int32)
            gvc = jnp.minimum(gv, num_vertices - 1)  # sentinel clamp
            for kk in range(l):
                out = out.at[qv[:, kk][:, None], gvc[None, :, kk]].max(
                    m.astype(jnp.int32))
            return _pack_or(acc, out, axis)

        return jax.jit(run, donate_argnums=0)

    def _build_phase2_bitmap_stream(self, k: int, num_vertices: int,
                                    l: int, nq: int):
        """Streamed-mode bitmap union WITHOUT the cache: the chunk's
        leaf rows arrive as an input (as in _build_phase2_stream) and
        scatter into the accumulated [nq, V] bitmap (VERDICT r4 item
        4 — streamed mode previously raised on union='device')."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.block_size
        axis = self.axis

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis),
                      P(), P(), (P(),) * 3, P(), (P(),) * 5),
            out_specs=P())
        def run(acc, gvs, bqm, ql, qd, qt3, qv, tables):
            labv, degv, vh, vm, vl = tables
            gv = gvs                                 # [K·B, L] local
            flat = gv.reshape(-1)
            gl = jnp.take(labv, flat).reshape(gv.shape)
            gd = jnp.take(degv, flat).reshape(gv.shape)
            gp3 = tuple(
                jnp.take(t, flat, axis=0).reshape(gv.shape[0], -1)
                for t in (vh, vm, vl))
            m = pe_mask_device_exact(gl, gd, gp3, ql, qd, qt3)
            gate = jnp.repeat(bqm[0].T, b, axis=1,
                              total_repeat_length=gv.shape[0])
            m = m & gate
            out = jnp.zeros((nq, num_vertices), dtype=jnp.int32)
            gvc = jnp.minimum(gv, num_vertices - 1)  # sentinel clamp
            for kk in range(l):
                out = out.at[qv[:, kk][:, None], gvc[None, :, kk]].max(
                    m.astype(jnp.int32))
            return _pack_or(acc, out, axis)

        return jax.jit(run, donate_argnums=0)

    def _build_phase2_bitmap(self, k: int, num_vertices: int, l: int,
                             nq: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.block_size
        axis = self.axis

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis), (P(axis),) * 3, P(axis),
                      P(axis), P(axis), P(), P(), (P(),) * 3, P()),
            out_specs=P())
        def run(acc, dl, dd, dp3, dv, sel, bqm, ql, qd, qt3, qv):
            rows = (sel[0][:, None] * b
                    + jnp.arange(b, dtype=jnp.int32)[None]).reshape(-1)
            gl = jnp.take(dl, rows, axis=0)
            gd = jnp.take(dd, rows, axis=0)
            gp3 = tuple(jnp.take(a, rows, axis=0) for a in dp3)
            gv = jnp.take(dv, rows, axis=0)
            m = pe_mask_device_exact(gl, gd, gp3, ql, qd, qt3)
            gate = jnp.repeat(bqm[0].T, b, axis=1,
                              total_repeat_length=rows.shape[0])
            m = m & gate
            out = jnp.zeros((nq, num_vertices), dtype=jnp.int32)
            for kk in range(l):
                out = out.at[qv[:, kk][:, None], gv[None, :, kk]].max(
                    m.astype(jnp.int32))
            return _pack_or(acc, out, axis)

        return jax.jit(run, donate_argnums=0)

    def _ensure_cache(self):
        """Build the streamed-mode leaf-block cache on first use.
        Returns None when not streamed, when disabled
        (GNNPE_STREAM_CACHE=0), or when the budget cannot even hold
        one phase-2 chunk (tiny-budget tests)."""
        import os
        if not self.streamed:
            return None
        if self._cache is None:
            if os.environ.get("GNNPE_STREAM_CACHE", "1") == "0":
                self._cache = False
            else:
                c = DeviceChunkCache(
                    self.mesh, self.axis,
                    int(self._host_vids.shape[1]), self.block_size,
                    self.nb_local,
                    getattr(self, "_cache_budget", None)
                    or cache_budget_bytes())
                self._cache = c if c.capacity >= self.k_chunk else False
        return self._cache or None

    def degrade_cache(self, factor: float = 0.5) -> float:
        """Free the streamed leaf-block cache pool and shrink its
        budget for the lazy re-creation — memory-pressure recovery:
        a stacked serving dispatch that RESOURCE_EXHAUSTEDs next to a
        full pool (youtube r5) should evict cache and retry, not
        fail.  Returns the new budget in bytes."""
        import gc
        cur = (getattr(self, "_cache_budget", None)
               or cache_budget_bytes())
        if self._cache:
            self._cache.buf = None
            self._cache._writes = {}
        self._cache = None
        self._cache_budget = cur * factor
        gc.collect()
        return self._cache_budget

    def prefill_cache(self, max_seconds: float = 1e9,
                      order: str = "popular") -> int:
        """Offline cache prefetch (streamed mode): load up to capacity
        blocks before queries run.  order='popular' loads the largest
        label-signature runs first — query label sequences follow the
        data path distribution, so big runs are both likelier to be
        touched and costlier to miss; 'index' loads in block order.
        Returns blocks loaded (0 when the cache is disabled)."""
        cache = self._ensure_cache()
        if cache is None:
            return 0
        if order == "popular" and self._blk_sig_first is not None:
            sig = self._blk_sig_first
            # Run id per block (consecutive equal sig-first = one run),
            # run length as popularity, stable within runs.
            nb = self.num_blocks
            new_run = np.empty(nb, bool)
            new_run[0] = True
            np.not_equal(sig[1:nb], sig[:nb - 1], out=new_run[1:])
            run_id = np.cumsum(new_run) - 1
            run_len = np.bincount(run_id)
            blk_order = np.argsort(-run_len[run_id], kind="stable")
        else:
            blk_order = None
        return cache.prefill(self._host_vids, blk_order, max_seconds)

    def close(self) -> None:
        """Release device buffers (HBM chunk-cache pool, leaf/limb
        tables, block summaries) and compiled-program caches.  An
        hour-scale driver that builds another engine on the same chip
        (the ladder runs PE then PGE per rung) must not keep both
        device states resident — the youtube rung's 8.8 GB cache pool
        plus PGE's offline fold is a guaranteed RESOURCE_EXHAUSTED."""
        self._cache = None
        self._tables = None
        self._phase1 = None
        self._phase2 = {}
        self._phase2_bitmap = {}
        self.d_vids = self.d_labels = self.d_degrees = None
        self.d_pde3 = None
        self.b_ub3 = self.b_llo3 = self.b_lhi3 = self.b_deg = None
        # Disk-tier working file (bucketed streamed build): the index
        # owns it; unlink so 50 GB build temps don't accumulate per
        # run.  save() copies into its own sidecar, and a Linux
        # unlink-while-mapped frees space only at the final unmap, so
        # surviving views stay valid.
        tp = getattr(self, "_owned_table_path", None)
        if tp is not None:
            self._host_vids = None
            self._owned_table_path = None
            try:
                os.unlink(tp)
            except OSError:
                pass
        import gc
        gc.collect()

    def warm(self, qbs=(8, 16)) -> float:
        """Precompile phase 1 + phase 2 for the given query buckets
        with one synthetic dispatch each (results discarded), so no
        live query pays a relay compile.  With the persistent cache
        this costs ~nothing after the first run on a machine.  Returns
        the wall seconds spent."""
        import time as _time
        import jax.numpy as jnp
        t0 = _time.perf_counter()
        n = self.mesh.shape[self.axis]
        k = self.k_chunk
        b = self.block_size
        dp = int(self.b_ub3[0].shape[-1])
        l = int(self._host_vids.shape[1])
        if self._phase1 is None:
            self._phase1 = self._build_phase1()
        cache = self._ensure_cache()
        if cache is not None:
            p2key = ("cache", k)
            if p2key not in self._phase2:
                self._phase2[p2key] = self._build_phase2_tbl(k)
        else:
            p2key = k
            if k not in self._phase2:
                self._phase2[k] = (
                    self._build_phase2_stream(k) if self.streamed
                    else self._build_phase2_tbl(k) if self.table_mode
                    else self._build_phase2(k))
        fused = self.nb_local <= k and not self.streamed
        if fused and "fused" not in self._phase2:
            self._phase2["fused"] = self._build_fused()
        for qb in qbs:
            z = lambda *s: jnp.zeros(s, jnp.float32)
            qt3 = (z(qb, dp),) * 3
            qd = jnp.zeros((qb, l), jnp.int32)
            ql = jnp.full((qb, l), -1, jnp.int32)
            if fused:
                if self.table_mode:
                    np.asarray(self._phase2["fused"](
                        self.d_vids, self.b_ub3, self.b_llo3,
                        self.b_lhi3, self.b_deg, ql, qd, qt3, qt3,
                        self._tables))
                else:
                    np.asarray(self._phase2["fused"](
                        self.d_labels, self.d_degrees, self.d_pde3,
                        self.b_ub3, self.b_llo3, self.b_lhi3,
                        self.b_deg, ql, qd, qt3, qt3))
                continue
            np.asarray(self._phase1(self.b_ub3, self.b_llo3,
                                    self.b_lhi3, self.b_deg,
                                    qt3, qt3, qd))
            sel = jnp.zeros((n, k), jnp.int32)
            bqm = jnp.zeros((n, k, qb), bool)
            if cache is not None:
                np.asarray(self._phase2[p2key](
                    cache.buf, sel, bqm, ql, qd, qt3, self._tables))
            elif self.streamed:
                gvs = jnp.zeros((n * k * b, l), jnp.int32)
                np.asarray(self._phase2[k](
                    gvs, bqm, ql, qd, qt3, self._tables))
            elif self.table_mode:
                np.asarray(self._phase2[k](
                    self.d_vids, sel, bqm, ql, qd, qt3, self._tables))
            else:
                np.asarray(self._phase2[k](
                    self.d_labels, self.d_degrees, self.d_pde3,
                    self.d_vids, sel, bqm, ql, qd, qt3))
        return _time.perf_counter() - t0

    # -- public search -------------------------------------------------
    def search(self, query_pde, plan_rows: np.ndarray,
               num_query_vertices: int, union: str = "host"
               ) -> List[np.ndarray]:
        import jax.numpy as jnp
        rows = np.asarray(plan_rows)
        q = len(rows)
        self.last_stats = None           # set by the chunked path
        # Floor the bucket at 8 so every plan with ≤8 rows (the common
        # small-query shapes 1/2/4) reuses the warmed qb=8 program —
        # warm() precompiles (8, 16) only (ADVICE r3 item 4).
        qb = _bucket(q, lo=8)
        pad = qb - q

        def padq(a, fill):
            return _pad_to(a, qb, fill)

        ql = jnp.asarray(padq(query_pde.labels[rows], -1))
        qd = jnp.asarray(padq(query_pde.degrees[rows], 0))
        thresh = _eps_threshold(query_pde.pde[rows],
                                self.base_epsilon)
        qt3 = tuple(jnp.asarray(padq(a, np.float32(0.0)))
                    for a in split3(thresh))
        qlbl3 = tuple(jnp.asarray(padq(a, np.float32(0.0)))
                      for a in split3(query_pde.pde_label[rows]))

        # Small-index fast path: every shard's blocks fit one chunk →
        # fuse block mask + leaf test into a single dispatch (no host
        # round trip between phases; each costs ~40 ms on the relay).
        if union == "host" and not self.streamed \
                and self.nb_local <= self.k_chunk:
            if "fused" not in self._phase2:
                self._phase2["fused"] = self._build_fused()
            if self.table_mode:
                mask = _unpack_mask(self._phase2["fused"](
                    self.d_vids, self.b_ub3, self.b_llo3, self.b_lhi3,
                    self.b_deg, ql, qd, qt3, qlbl3, self._tables), q)
            else:
                mask = _unpack_mask(self._phase2["fused"](
                    self.d_labels, self.d_degrees, self.d_pde3,
                    self.b_ub3, self.b_llo3, self.b_lhi3, self.b_deg,
                    ql, qd, qt3, qlbl3), q)
            return extract_candidates(mask, self._host_vids,
                                      query_pde.vids[rows],
                                      num_query_vertices)

        if self._phase1 is None:
            self._phase1 = self._build_phase1()
        bmask = _unpack_mask(np.asarray(self._phase1(
            self.b_ub3, self.b_llo3, self.b_lhi3, self.b_deg,
            qt3, qlbl3, qd)), q)          # [q, NB_pad]
        blocks_phase1 = int(bmask.any(axis=0).sum())

        # Signature-range prune (table mode): exact-label matches of a
        # query path live in the contiguous sig-sorted block run
        # [lo, hi) — everything outside is dead, however well its MBR
        # summary overlaps.  Conservative: equal labels ⟹ equal sig.
        if self._blk_sig_first is not None:
            qsig = path_sig(query_pde.labels[rows], self._sig_radix)
            lo = np.searchsorted(self._blk_sig_last, qsig, side="left")
            hi = np.searchsorted(self._blk_sig_first, qsig,
                                 side="right")
            cols = np.arange(bmask.shape[1])
            bmask = bmask & ((cols[None, :] >= lo[:, None]) &
                             (cols[None, :] < hi[:, None]))

        # Host: per-shard surviving-block lists, processed in chunks of
        # a FIXED K so the compiled phase-2 shape is query-independent
        # (the host loop varies, the program does not).
        n = self.mesh.shape[self.axis]
        nbl = self.nb_local
        any_blk = bmask.any(axis=0)
        sel_per = [np.nonzero(any_blk[s * nbl:(s + 1) * nbl])[0]
                   for s in range(n)]
        kmax = max((len(s) for s in sel_per), default=0)
        k = self.k_chunk
        self.last_stats = dict(
            blocks=self.num_blocks, phase1=blocks_phase1,
            survived=int(any_blk.sum()), kmax=int(kmax),
            chunks=int(-(-kmax // k)) if kmax else 0)
        if kmax == 0:
            return [np.zeros(0, dtype=np.int64)
                    for _ in range(num_query_vertices)]
        num_chunks = -(-kmax // k)
        b = self.block_size
        cache = self._ensure_cache()
        if cache is not None:
            hits0, miss0 = cache.hits, cache.misses

        def chunk_parts(c):
            return [ss[c * k:(c + 1) * k] for ss in sel_per]

        def chunk_inputs(c):
            # Pad selections with block id 0; the bqm gate kills it.
            sel = np.zeros((n, k), dtype=np.int32)
            bqm = np.zeros((n, k, qb), dtype=bool)
            for s, part in enumerate(chunk_parts(c)):
                sel[s, :len(part)] = part
                bqm[s, :len(part), :q] = bmask[:, s * nbl + part].T
            return sel, jnp.asarray(sel), jnp.asarray(bqm)

        if union == "device":
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            l = query_pde.vids.shape[1]
            nv = self._num_vertices
            mode = ("cache" if cache is not None
                    else "stream" if self.streamed
                    else "tbl" if self.table_mode else "arr")
            # ACTIVE-QUERY GROUPING: a stacked search (online_many)
            # pads hundreds of plan paths to one qb bucket; masking
            # EVERY leaf row against every padded path made stacked
            # work scale ~quadratically (dblp 50-stack: ~30 min).
            # Instead, each chunk masks only the paths whose phase-1
            # gate touches its blocks, bucketed small — total mask
            # work ≈ the per-query sum, while the leaf gathers/
            # uploads and the dispatch count stay amortized across
            # the stack.  jit retraces per (qa, nqb) bucket; the
            # builder is cached per (mode, k, l, nqb).
            nqb = _bucket(num_query_vertices, lo=8)
            key = (mode, k, l, nqb)
            if key not in self._phase2_bitmap:
                builder = (
                    self._build_phase2_bitmap_stream
                    if mode == "stream"
                    else self._build_phase2_bitmap_tbl
                    if mode in ("cache", "tbl")
                    else self._build_phase2_bitmap)
                self._phase2_bitmap[key] = builder(k, nv, l, nqb)
            fn = self._phase2_bitmap[key]
            ql_h = np.asarray(query_pde.labels[rows])
            qd_h = np.asarray(query_pde.degrees[rows])
            qt3_h = split3(thresh)
            qv_h = np.asarray(query_pde.vids[rows])

            def active_inputs(c):
                # Pad selections with block id 0; bqm gates it off.
                sel = np.zeros((n, k), dtype=np.int32)
                parts = chunk_parts(c)
                cols = np.concatenate(
                    [s * nbl + p for s, p in enumerate(parts)]) \
                    if any(len(p) for p in parts) else \
                    np.zeros(0, np.int64)
                act = np.nonzero(bmask[:, cols].any(axis=1))[0] \
                    if len(cols) else np.zeros(0, np.int64)
                qa = _bucket(max(len(act), 1), lo=8)
                bqm = np.zeros((n, k, qa), dtype=bool)
                for s, part in enumerate(parts):
                    sel[s, :len(part)] = part
                    bqm[s, :len(part), :len(act)] = \
                        bmask[np.ix_(act, s * nbl + part)].T
                pad = qa - len(act)
                qla = jnp.asarray(_pad_to(ql_h[act], qa, -1))
                qda = jnp.asarray(_pad_to(qd_h[act], qa, 0))
                qt3a = tuple(
                    jnp.asarray(_pad_to(a[act], qa, np.float32(0.0)))
                    for a in qt3_h)
                qva = jnp.asarray(_pad_to(qv_h[act], qa, 0))
                return (sel, jnp.asarray(sel), jnp.asarray(bqm),
                        qla, qda, qt3a, qva)

            # The union accumulates ON DEVICE (acc donated through the
            # chain) as a packed uint32 bitmap; one [nq, V/32]
            # download per query/stack, not per chunk.
            acc = jax.device_put(
                jnp.zeros((nqb, _bitmap_words(nv)), jnp.uint32),
                NamedSharding(self.mesh, P()))
            # Sliding in-flight window (cache/stream modes): each
            # cache write donates the pool buffer, but queued chunk
            # reads pin the previous version, so an unbounded dispatch
            # chain accumulates multi-GB buffer copies (the youtube
            # serving RESOURCE_EXHAUSTED).  A 4-byte forced readback
            # every `window` chunks drains the chain.
            import os as _os
            window = (int(_os.environ.get("GNNPE_STREAM_WINDOW", "8"))
                      if mode in ("cache", "stream") else 1 << 30)
            for c in range(num_chunks):
                sel, selj, bqmj, qla, qda, qt3a, qva = \
                    active_inputs(c)
                if mode == "cache":
                    slots = cache.ensure(chunk_parts(c),
                                         self._host_vids, k)
                    acc = fn(acc, cache.buf, jnp.asarray(slots), bqmj,
                             qla, qda, qt3a, qva, self._tables)
                elif mode == "stream":
                    gcols = np.concatenate(
                        [((s * nbl + sel[s])[:, None] * b
                          + np.arange(b)[None]).reshape(-1)
                         for s in range(n)])
                    gvj = jax.device_put(
                        np.ascontiguousarray(self._host_vids[gcols]),
                        NamedSharding(self.mesh, P(self.axis)))
                    acc = fn(acc, gvj, bqmj, qla, qda, qt3a, qva,
                             self._tables)
                elif mode == "tbl":
                    acc = fn(acc, self.d_vids, selj, bqmj, qla, qda,
                             qt3a, qva, self._tables)
                else:
                    acc = fn(acc, self.d_labels, self.d_degrees,
                             self.d_pde3, self.d_vids, selj, bqmj,
                             qla, qda, qt3a, qva)
                if (c + 1) % window == 0:
                    np.asarray(acc[:1, :1])
            out = _unpack_mask(np.asarray(acc),
                               num_query_vertices)[:, :nv]
            if cache is not None:
                self.last_stats.update(
                    cache_hits=cache.hits - hits0,
                    cache_misses=cache.misses - miss0)
            return [np.nonzero(out[i])[0].astype(np.int64)
                    for i in range(num_query_vertices)]

        if cache is not None:
            p2key = ("cache", k)
            if p2key not in self._phase2:
                self._phase2[p2key] = self._build_phase2_tbl(k)
        else:
            p2key = k
            if k not in self._phase2:
                self._phase2[k] = (
                    self._build_phase2_stream(k) if self.streamed
                    else self._build_phase2_tbl(k) if self.table_mode
                    else self._build_phase2(k))
        phase2 = self._phase2[p2key]
        # Two passes: dispatch every chunk first (async — device
        # executions and host→device uploads pipeline), force results
        # second.  Serializing on np.asarray per chunk paid a full
        # relay round trip per chunk — the dblp/youtube p90 tail.
        # Streamed mode bounds in-flight dispatches with a sliding
        # window (ADVICE r4 item 1): without it a many-chunk query
        # holds every chunk's uploaded leaf rows on device at once —
        # in exactly the mode built for HBM-constrained indexes.
        import os
        window = (int(os.environ.get("GNNPE_STREAM_WINDOW", "8"))
                  if self.streamed else 1 << 30)
        pend, gcols_parts, masks = [], [], []
        for c in range(num_chunks):
            sel, selj, bqmj = chunk_inputs(c)
            # Map mask columns back to global entry rows.
            gcols = np.concatenate(
                [((s * nbl + sel[s])[:, None] * b
                  + np.arange(b)[None]).reshape(-1) for s in range(n)])
            gcols_parts.append(gcols)
            if cache is not None:
                # Cached streamed mode: only MISS blocks ride the
                # relay pipe; the gather reads the HBM-resident pool.
                slots = cache.ensure(chunk_parts(c), self._host_vids,
                                     k)
                pend.append(phase2(
                    cache.buf, jnp.asarray(slots), bqmj, ql, qd, qt3,
                    self._tables))
            elif self.streamed:
                # Uncached fallback: upload this chunk's leaf rows,
                # host-gathered from the RAM-resident sorted table.
                import jax
                from jax.sharding import (NamedSharding,
                                          PartitionSpec as P)
                gvj = jax.device_put(
                    np.ascontiguousarray(self._host_vids[gcols]),
                    NamedSharding(self.mesh, P(self.axis)))
                pend.append(phase2(
                    gvj, bqmj, ql, qd, qt3, self._tables))
            elif self.table_mode:
                pend.append(phase2(
                    self.d_vids, selj, bqmj, ql, qd, qt3,
                    self._tables))
            else:
                pend.append(phase2(
                    self.d_labels, self.d_degrees, self.d_pde3,
                    self.d_vids, selj, bqmj, ql, qd, qt3))
            if len(pend) > window:
                masks.append(_unpack_mask(pend.pop(0), q))
        masks.extend(_unpack_mask(r, q) for r in pend)
        if cache is not None:
            self.last_stats.update(cache_hits=cache.hits - hits0,
                                   cache_misses=cache.misses - miss0)
        mask = np.concatenate(masks, axis=1)
        gcols = np.concatenate(gcols_parts)
        return extract_candidates(mask, self._host_vids[gcols],
                                  query_pde.vids[rows],
                                  num_query_vertices)


class DevicePackedPGESearch:
    """PGE variant: blocks over the sorted VERTEX table (one entry per
    vertex boxed by its path group, GNN-PGE custom.h:160-186), block
    summaries = the PGE aux index (scalar max degree + label MBR,
    custom.h:197-290).  Same two-phase fused search; the leaf output
    directly indexes data vertices (order[rows])."""

    def __init__(self, mesh, index, axis: str = "graph",
                 base_epsilon: float = 1e-6):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        self.mesh = mesh
        self.axis = axis
        self.base_epsilon = base_epsilon
        self.block_size = b = index.block_size
        n = mesh.shape[axis]
        nb = len(index.blk_group_ub)
        self.nb_local = nbl = max(1, -(-nb // n))
        nb_pad = n * nbl
        ent_rows = nb_pad * b

        labels = _pad_to(index.labels, ent_rows, -2)
        degrees = _pad_to(index.degrees, ent_rows, 0)
        order = _pad_to(index.order.astype(np.int64), ent_rows, -1)
        ghi = _pad_to(index.group[:, 1, :], ent_rows, _NEG)
        llo = _pad_to(index.label_group[:, 0, :], ent_rows, _POS)
        lhi = _pad_to(index.label_group[:, 1, :], ent_rows, _NEG)

        shard = NamedSharding(mesh, P(axis))
        put = lambda a: jax.device_put(jnp.asarray(a), shard)
        self.d_labels = put(labels)
        self.d_degrees = put(degrees)
        self.d_ghi3 = tuple(put(a) for a in split3(ghi))
        self.d_llo3 = tuple(put(a) for a in split3(llo))
        self.d_lhi3 = tuple(put(a) for a in split3(lhi))
        self._order = order
        self.b_gub3 = tuple(put(a) for a in split3(
            _pad_to(index.blk_group_ub, nb_pad, _NEG)))
        self.b_llo3 = tuple(put(a) for a in split3(
            _pad_to(index.blk_lgroup_lo, nb_pad, _POS)))
        self.b_lhi3 = tuple(put(a) for a in split3(
            _pad_to(index.blk_lgroup_hi, nb_pad, _NEG)))
        self.b_deg = put(_pad_to(index.blk_max_deg, nb_pad, 0))
        # Host per-block label range: PGEPackedIndex sorts by label
        # first (packed.py lexsort), so a query vertex's exact-label
        # matches live in one contiguous block run — searchsorted
        # prunes every other block before phase 2 (the linear-in-V
        # surviving-block cost of VERDICT r3 weak item 3).
        nv = len(index.order)
        nb_real = -(-nv // b) if nv else 0
        lab_s = index.labels.astype(np.int64)
        hi_pad = np.int64(1) << 40
        bf = np.full(nb_pad, hi_pad, np.int64)
        bl = np.full(nb_pad, hi_pad, np.int64)
        if nb_real:
            bf[:nb_real] = lab_s[np.arange(nb_real) * b]
            bl[:nb_real] = lab_s[
                np.minimum(np.arange(1, nb_real + 1) * b, nv) - 1]
        self._blk_lab_first = bf
        self._blk_lab_last = bl
        self.k_chunk = _chunk_k(nbl)
        self.last_stats = None
        # Device copy of the entry→vertex map for the bitmap union
        # (int32; pads are -1 and masked in-kernel).
        self.d_order = put(order.astype(np.int32))
        self._num_vertices = int(index.order.max(initial=0)) + 1
        self._phase1 = None
        self._phase2 = {}
        self._phase2_bitmap = {}

    def _build_phase1(self):
        import jax
        from jax.sharding import PartitionSpec as P

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=((P(self.axis),) * 3,) * 3 + (P(self.axis),)
            + ((P(),) * 3, (P(),) * 3, (P(),) * 3, P()),
            out_specs=P(None, self.axis))
        def run(gub3, llo3, lhi3, bdeg, qglo3, qllo3, qlhi3, qdeg):
            dom = ge3(*(a[None] for a in gub3),
                      *(a[:, None, :] for a in qglo3)).all(-1)
            overlap = (ge3(*(a[None] for a in lhi3),
                           *(a[:, None, :] for a in qllo3)) &
                       ge3(*(a[:, None, :] for a in qlhi3),
                           *(a[None] for a in llo3))).all(-1)
            deg = qdeg[:, None] <= bdeg[None]
            return _pack_mask(dom & overlap & deg)

        return jax.jit(run)

    def _build_phase2(self, k: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.block_size

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis),
                      (P(self.axis),) * 3, (P(self.axis),) * 3,
                      (P(self.axis),) * 3,
                      P(self.axis), P(self.axis),
                      P(), P(), (P(),) * 3, (P(),) * 3, (P(),) * 3),
            out_specs=P(None, self.axis))
        def run(dl, dd, ghi3, llo3, lhi3, sel, bqm,
                ql, qd, qglo3, qllo3, qlhi3):
            rows = (sel[0][:, None] * b
                    + jnp.arange(b, dtype=jnp.int32)[None]).reshape(-1)
            gl = jnp.take(dl, rows, axis=0)
            gd = jnp.take(dd, rows, axis=0)
            g3 = tuple(jnp.take(a, rows, axis=0) for a in ghi3)
            lo3 = tuple(jnp.take(a, rows, axis=0) for a in llo3)
            hi3 = tuple(jnp.take(a, rows, axis=0) for a in lhi3)
            m = pge_mask_device_exact(gl, gd, g3, lo3, hi3,
                                      ql, qd, qglo3, qllo3, qlhi3)
            gate = jnp.repeat(bqm[0].T, b, axis=1,
                              total_repeat_length=rows.shape[0])
            return _pack_mask(m & gate)

        return jax.jit(run)

    def _build_phase2_bitmap(self, k: int, num_vertices: int, nq: int):
        """PGE device-bitmap union (VERDICT r3 item 10, mirroring the
        PE ``_build_phase2_bitmap_tbl``): the leaf mask scatters into a
        per-shard [nq, V] vertex bitmap that psum-ORs across the mesh —
        no full leaf mask ever ships host-side per shard.  ``acc``
        (donated) carries the union across chunks ON DEVICE, so the
        host downloads one [nq, V] bitmap per query, not per chunk
        (ADVICE r4 item 4 — at million-vertex scale the per-chunk
        download was tens of MB through the ~38 MB/s relay pipe)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.block_size
        axis = self.axis

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis),
                      (P(axis),) * 3, (P(axis),) * 3,
                      (P(axis),) * 3, P(axis),
                      P(axis), P(axis), P(),
                      P(), P(), (P(),) * 3, (P(),) * 3, (P(),) * 3),
            out_specs=P())
        def run(acc, dl, dd, ghi3, llo3, lhi3, dord, sel, bqm, aidx,
                ql, qd, qglo3, qllo3, qlhi3):
            rows = (sel[0][:, None] * b
                    + jnp.arange(b, dtype=jnp.int32)[None]).reshape(-1)
            gl = jnp.take(dl, rows, axis=0)
            gd = jnp.take(dd, rows, axis=0)
            g3 = tuple(jnp.take(a, rows, axis=0) for a in ghi3)
            lo3 = tuple(jnp.take(a, rows, axis=0) for a in llo3)
            hi3 = tuple(jnp.take(a, rows, axis=0) for a in lhi3)
            m = pge_mask_device_exact(gl, gd, g3, lo3, hi3,
                                      ql, qd, qglo3, qllo3, qlhi3)
            gate = jnp.repeat(bqm[0].T, b, axis=1,
                              total_repeat_length=rows.shape[0])
            go = jnp.take(dord, rows)
            m = m & gate & (go >= 0)[None]
            goc = jnp.clip(go, 0, num_vertices - 1)
            # aidx maps mask row i → bitmap row (the stacked query
            # vertex this chunk-active row belongs to); padded rows
            # carry an all-false gate, so their .max(0) is a no-op.
            out = jnp.zeros((nq, num_vertices), dtype=jnp.int32)
            out = out.at[aidx[:, None], goc[None, :]].max(
                m.astype(jnp.int32))
            return _pack_or(acc, out, axis)

        return jax.jit(run, donate_argnums=0)

    def _build_fused(self):
        """Single-dispatch search for small indexes (see the PE
        version): block mask computed on device gates the leaf rows
        directly — no host round trip between phases."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        b = self.block_size

        @functools.partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis),
                      (P(self.axis),) * 3, (P(self.axis),) * 3,
                      (P(self.axis),) * 3,
                      (P(self.axis),) * 3, (P(self.axis),) * 3,
                      (P(self.axis),) * 3, P(self.axis),
                      P(), P(), (P(),) * 3, (P(),) * 3, (P(),) * 3),
            out_specs=P(None, self.axis))
        def run(dl, dd, ghi3, llo3, lhi3, gub3, bllo3, blhi3, bdeg,
                ql, qd, qglo3, qllo3, qlhi3):
            dom = ge3(*(a[None] for a in gub3),
                      *(a[:, None, :] for a in qglo3)).all(-1)
            overlap = (ge3(*(a[None] for a in blhi3),
                           *(a[:, None, :] for a in qllo3)) &
                       ge3(*(a[:, None, :] for a in qlhi3),
                           *(a[None] for a in bllo3))).all(-1)
            degm = qd[:, None] <= bdeg[None]
            bmask = dom & overlap & degm
            m = pge_mask_device_exact(dl, dd, ghi3, llo3, lhi3,
                                      ql, qd, qglo3, qllo3, qlhi3)
            gate = jnp.repeat(bmask, b, axis=1,
                              total_repeat_length=dl.shape[0])
            return _pack_mask(m & gate)

        return jax.jit(run)

    def close(self) -> None:
        """Release device buffers and compiled-program caches (see
        DevicePackedPESearch.close)."""
        self._phase1 = None
        self._phase2 = {}
        self._phase2_bitmap = {}
        self.d_labels = self.d_degrees = self.d_order = None
        self.d_ghi3 = self.d_llo3 = self.d_lhi3 = None
        self.b_gub3 = self.b_llo3 = self.b_lhi3 = self.b_deg = None
        import gc
        gc.collect()

    def warm(self, qbs=(8, 16)) -> float:
        """Precompile phase 1 + phase 2 (see DevicePackedPESearch.warm)."""
        import time as _time
        import jax.numpy as jnp
        t0 = _time.perf_counter()
        n = self.mesh.shape[self.axis]
        k = self.k_chunk
        dp = int(self.b_gub3[0].shape[-1])
        fused = self.nb_local <= k
        if fused and "fused" not in self._phase2:
            self._phase2["fused"] = self._build_fused()
        if self._phase1 is None:
            self._phase1 = self._build_phase1()
        if not fused and k not in self._phase2:
            self._phase2[k] = self._build_phase2(k)
        for qb in qbs:
            z = lambda *s: jnp.zeros(s, jnp.float32)
            t3 = (z(qb, dp),) * 3
            qd = jnp.zeros((qb,), jnp.int32)
            ql = jnp.full((qb,), -1, jnp.int32)
            if fused:
                np.asarray(self._phase2["fused"](
                    self.d_labels, self.d_degrees, self.d_ghi3,
                    self.d_llo3, self.d_lhi3, self.b_gub3,
                    self.b_llo3, self.b_lhi3, self.b_deg,
                    ql, qd, t3, t3, t3))
                continue
            np.asarray(self._phase1(self.b_gub3, self.b_llo3,
                                    self.b_lhi3, self.b_deg,
                                    t3, t3, t3, qd))
            sel = jnp.zeros((n, k), jnp.int32)
            bqm = jnp.zeros((n, k, qb), bool)
            np.asarray(self._phase2[k](
                self.d_labels, self.d_degrees, self.d_ghi3,
                self.d_llo3, self.d_lhi3, sel, bqm,
                ql, qd, t3, t3, t3))
        return _time.perf_counter() - t0

    def search(self, q_labels, q_degrees, q_group, q_label_group,
               q_vertex_ids, union: str = "host") -> List[np.ndarray]:
        import jax.numpy as jnp
        q = len(q_labels)
        self.last_stats = None           # set by the chunked path
        qb = _bucket(q, lo=8)    # reuse the warmed qb=8 program


        def padq(a, fill):
            return _pad_to(a, qb, fill)

        ql = jnp.asarray(padq(q_labels, -1))
        qd = jnp.asarray(padq(q_degrees, 0))

        def limbs(x):
            return tuple(jnp.asarray(padq(a, np.float32(0.0)))
                         for a in split3(x))
        # ε slack applied on host in f64 before limb-splitting (see
        # match/filter.py:pge_candidates on the strict-compare bug).
        qglo3 = limbs(_eps_threshold(q_group[:, 0, :],
                                     self.base_epsilon))
        qllo3 = limbs(q_label_group[:, 0, :])
        qlhi3 = limbs(q_label_group[:, 1, :])

        # Small-index fast path: one fused dispatch (see PE search).
        if union == "host" and self.nb_local <= self.k_chunk:
            if "fused" not in self._phase2:
                self._phase2["fused"] = self._build_fused()
            mask = _unpack_mask(self._phase2["fused"](
                self.d_labels, self.d_degrees, self.d_ghi3,
                self.d_llo3, self.d_lhi3, self.b_gub3, self.b_llo3,
                self.b_lhi3, self.b_deg, ql, qd,
                qglo3, qllo3, qlhi3), q)
            out: List[np.ndarray] = []
            for j, _ in enumerate(q_vertex_ids):
                hit = self._order[mask[j]]
                out.append(np.unique(hit[hit >= 0]).astype(np.int64))
            return out

        if self._phase1 is None:
            self._phase1 = self._build_phase1()
        bmask = _unpack_mask(np.asarray(self._phase1(
            self.b_gub3, self.b_llo3, self.b_lhi3, self.b_deg,
            qglo3, qllo3, qlhi3, qd)), q)
        blocks_phase1 = int(bmask.any(axis=0).sum())

        # Label-range prune: blocks are label-sorted, so only the
        # contiguous run containing each query vertex's label can hold
        # exact-label matches (the leaf test requires equality).
        qlab = np.asarray(q_labels).astype(np.int64)
        lo = np.searchsorted(self._blk_lab_last, qlab, side="left")
        hi = np.searchsorted(self._blk_lab_first, qlab, side="right")
        cols = np.arange(bmask.shape[1])
        bmask = bmask & ((cols[None, :] >= lo[:, None]) &
                         (cols[None, :] < hi[:, None]))

        n = self.mesh.shape[self.axis]
        nbl = self.nb_local
        any_blk = bmask.any(axis=0)
        sel_per = [np.nonzero(any_blk[s * nbl:(s + 1) * nbl])[0]
                   for s in range(n)]
        kmax = max((len(s) for s in sel_per), default=0)
        k = self.k_chunk
        self.last_stats = dict(
            blocks=len(self._blk_lab_first), phase1=blocks_phase1,
            survived=int(any_blk.sum()), kmax=int(kmax),
            chunks=int(-(-kmax // k)) if kmax else 0)
        if kmax == 0:
            return [np.zeros(0, dtype=np.int64) for _ in q_vertex_ids]
        # Fixed-K chunking: query-independent compiled shape (see the
        # PE search — the host loop varies, the program does not).
        num_chunks = -(-kmax // k)
        b = self.block_size

        if union == "device":
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            nq = len(q_vertex_ids)
            # ACTIVE-QUERY GROUPING (see the PE device-union path):
            # each chunk masks only the query vertices whose phase-1
            # gate touches its blocks — stacked mask work stays ≈ the
            # per-query sum while leaf gathers and dispatches
            # amortize across the stack.
            nqb = _bucket(nq, lo=8)
            key = (k, nqb)
            if key not in self._phase2_bitmap:
                self._phase2_bitmap[key] = self._build_phase2_bitmap(
                    k, self._num_vertices, nqb)
            qlab_h = np.asarray(q_labels)
            qdeg_h = np.asarray(q_degrees)
            qglo_h = split3(_eps_threshold(q_group[:, 0, :],
                                           self.base_epsilon))
            qllo_h = split3(q_label_group[:, 0, :])
            qlhi_h = split3(q_label_group[:, 1, :])
            # Union accumulates ON DEVICE (acc donated through the
            # chain) as a packed uint32 bitmap; one [nq, V/32]
            # download per query/stack (ADVICE r4 item 4).
            acc = jax.device_put(
                jnp.zeros((nqb, _bitmap_words(self._num_vertices)),
                          jnp.uint32),
                NamedSharding(self.mesh, P()))
            for c in range(num_chunks):
                sel = np.zeros((n, k), dtype=np.int32)
                parts = [ss[c * k:(c + 1) * k] for ss in sel_per]
                cols = np.concatenate(
                    [s * nbl + p for s, p in enumerate(parts)]) \
                    if any(len(p) for p in parts) else \
                    np.zeros(0, np.int64)
                act = np.nonzero(bmask[:, cols].any(axis=1))[0] \
                    if len(cols) else np.zeros(0, np.int64)
                qa = _bucket(max(len(act), 1), lo=8)
                bqm = np.zeros((n, k, qa), dtype=bool)
                for s, part in enumerate(parts):
                    sel[s, :len(part)] = part
                    bqm[s, :len(part), :len(act)] = \
                        bmask[np.ix_(act, s * nbl + part)].T
                aidx = jnp.asarray(
                    _pad_to(act.astype(np.int32), qa, 0))
                qla = jnp.asarray(_pad_to(qlab_h[act], qa, -1))
                qda = jnp.asarray(_pad_to(qdeg_h[act], qa, 0))
                pq = lambda t: tuple(
                    jnp.asarray(_pad_to(a[act], qa, np.float32(0.0)))
                    for a in t)
                acc = self._phase2_bitmap[key](
                    acc, self.d_labels, self.d_degrees, self.d_ghi3,
                    self.d_llo3, self.d_lhi3, self.d_order,
                    jnp.asarray(sel), jnp.asarray(bqm), aidx,
                    qla, qda, pq(qglo_h), pq(qllo_h), pq(qlhi_h))
            out = _unpack_mask(np.asarray(acc),
                               nq)[:, :self._num_vertices]
            return [np.nonzero(out[j])[0].astype(np.int64)
                    for j in range(nq)]

        if k not in self._phase2:
            self._phase2[k] = self._build_phase2(k)
        pend, gcols_parts = [], []
        for c in range(num_chunks):
            sel = np.zeros((n, k), dtype=np.int32)
            bqm = np.zeros((n, k, qb), dtype=bool)
            for s, ss in enumerate(sel_per):
                part = ss[c * k:(c + 1) * k]
                sel[s, :len(part)] = part
                bqm[s, :len(part), :q] = bmask[:, s * nbl + part].T
            pend.append(self._phase2[k](
                self.d_labels, self.d_degrees, self.d_ghi3, self.d_llo3,
                self.d_lhi3, jnp.asarray(sel), jnp.asarray(bqm),
                ql, qd, qglo3, qllo3, qlhi3))
            gcols_parts.append(np.concatenate(
                [((s * nbl + sel[s])[:, None] * b
                  + np.arange(b)[None]).reshape(-1) for s in range(n)]))
        masks = [_unpack_mask(r, q) for r in pend]
        mask = np.concatenate(masks, axis=1)
        gcols = np.concatenate(gcols_parts)
        vid_cols = self._order[gcols]
        out: List[np.ndarray] = []
        for j, _ in enumerate(q_vertex_ids):
            hit = vid_cols[mask[j]]
            out.append(np.unique(hit[hit >= 0]).astype(np.int64))
        return out
