"""Salvage the youtube_skew PE l=2 index from the crashed round-5
build's surviving disk-tier table.

The 2026-08-22 run completed the full bucketed out-of-core build (the
50.4 GB sorted leaf table at .cache/gnnpe_spill/leaf_table_2952.bin)
and then OOMed in warm(): the un-chunked phase-1 block-mask kernel
materialized ~[16, 8.2e6, 6] limb-compare temps (fixed by the chunked
phase-1, device_packed.py::_P1_CHUNK).  Host-side state (sig ranges,
block summaries) died with the process, but both are pure functions of
the sorted table + embeddings, so this script recomputes them and
writes a standard ``DevicePackedPESearch.save``-format npz whose
``.vids.bin`` sidecar is a HARDLINK to the surviving table (no 50 GB
copy).  The ladder then serves it via ``--pe-load``.

Every quantity is recomputed with the same primitives the build uses
(`_fold_blocks`, `path_sig`, `pe_pad_shapes`), so the result is
bit-identical to what the crashed process held — and the ladder's
chunked-oracle spot checks re-verify the loaded index end to end.
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from gnnpe_tpu.config import PEConfig
from gnnpe_tpu.engine import PEEngine
from gnnpe_tpu.index.bucket_build import _fold_blocks
from gnnpe_tpu.index.device_packed import (_outward, path_sig,
                                           pe_pad_shapes,
                                           sig_radix_of)
from gnnpe_tpu.io.datasets import load_dataset


def main(table: str, out: str, dataset: str = "youtube_skew",
         seed: int = 0, b: int = 512, workers: int = 2) -> None:
    t_all = time.time()
    g = load_dataset(dataset, seed=seed)
    cfg = PEConfig.from_cli(l=2, e=2, p=5)
    vertices = PEEngine(cfg, g).embedder(g)
    v, d, l = g.num_vertices, vertices.dim, cfg.path_length
    hv = np.memmap(table, np.int32, "r").reshape(-1, l)
    ent_rows = len(hv)

    # Real-entry count: the sentinel pad (vid == v) is a contiguous
    # tail; reverse chunk scan finds the last real row.
    p = ent_rows
    i, ch = ent_rows, 1 << 24
    while i > 0:
        j = max(0, i - ch)
        nz = np.nonzero(np.asarray(hv[j:i, 0]) != v)[0]
        if len(nz):
            p = j + int(nz[-1]) + 1
            break
        i = j
    p_pad, v_pad, nb, nbl = pe_pad_shapes(p, b, v, 1, pow2=False)
    nb_pad = nbl
    assert nb_pad * b == ent_rows, (nb_pad * b, ent_rows)
    print(f"[salvage] p={p} ent_rows={ent_rows} nb={nb} "
          f"({time.time()-t_all:.0f}s)", flush=True)

    sig_radix = sig_radix_of(vertices)
    labv = np.concatenate([vertices.labels.astype(np.int32),
                           np.full(v_pad - v, -2, np.int32)])
    degv = np.concatenate([vertices.degrees.astype(np.int32),
                           np.zeros(v_pad - v, np.int32)])
    vde_up = _outward(vertices.vde, True, v_pad - v)
    x_up = _outward(vertices.x, True, v_pad - v)
    x_dn = _outward(vertices.x, False, v_pad - v)

    # Per-block sig ranges: anchors only (first row, last REAL row).
    hi_sent = np.int64(1) << 62
    nreal = -(-p // b)
    blk_first = np.full(nb_pad, hi_sent, np.int64)
    blk_last = np.full(nb_pad, hi_sent, np.int64)
    idx = np.arange(nreal, dtype=np.int64)
    firsts = np.asarray(hv[idx * b])
    lasts = np.asarray(hv[np.minimum((idx + 1) * b, p) - 1])
    blk_first[:nreal] = path_sig(labv[firsts], sig_radix)
    blk_last[:nreal] = path_sig(labv[lasts], sig_radix)
    print(f"[salvage] sig anchors done ({time.time()-t_all:.0f}s)",
          flush=True)

    # Block summaries: chunked, thread-parallel host fold over the
    # memmap (identical layout to the build's _fold_blocks).
    blk_ub = np.empty((nb_pad, l * d), np.float32)
    blk_lhi = np.empty((nb_pad, l * d), np.float32)
    blk_llo = np.empty((nb_pad, l * d), np.float32)
    blk_deg = np.empty((nb_pad, l), np.int32)
    chunk = max(b, ((1 << 23) // b) * b)

    def work(lo):
        hi2 = min(lo + chunk, ent_rows)
        _fold_blocks(np.asarray(hv[lo:hi2]), lo // b, hi2 // b, b,
                     vde_up, x_up, x_dn, degv,
                     blk_ub, blk_llo, blk_lhi, blk_deg)

    todo = list(range(0, ent_rows, chunk))
    done = 0
    with ThreadPoolExecutor(max_workers=workers) as pool:
        for _ in pool.map(work, todo):
            done += 1
            if done % 50 == 0:
                print(f"[salvage] fold {done}/{len(todo)} "
                      f"({time.time()-t_all:.0f}s)", flush=True)

    meta = np.array([p, b, nb, nbl, 1, sig_radix, 1, l], np.int64)
    np.savez(out, blk_ub=blk_ub, blk_llo=blk_llo, blk_lhi=blk_lhi,
             blk_deg=blk_deg, blk_sig_first=blk_first,
             blk_sig_last=blk_last, meta=meta,
             host_vids=np.zeros((0, l), np.int32))
    npz = out if out.endswith(".npz") else out + ".npz"
    sidecar = npz + ".vids.bin"
    if not os.path.exists(sidecar):
        os.link(table, sidecar)
    print(f"[salvage] wrote {npz} (+ sidecar hardlink) in "
          f"{time.time()-t_all:.0f}s", flush=True)


if __name__ == "__main__":
    main(table=sys.argv[1], out=sys.argv[2],
         dataset=sys.argv[3] if len(sys.argv) > 3 else "youtube_skew")
