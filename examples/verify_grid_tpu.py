"""Full-size exactness check of the grid kNN backend on REAL hardware.

The CPU test suite runs the Pallas kernels in interpret mode, which does NOT
reproduce TPU float semantics — in particular the TPU flushes denormal f32s
to zero in copy/select paths, which silently corrupted a bitcast-packed
index lane in an earlier grid layout (ints < 2^23 bitcast to f32 are
denormal; see _layout_queries). Any change to the grid pipeline must rerun
this check on the real chip, not just the interpret-mode tests.

Usage: python examples/verify_grid_tpu.py [Nq] [M] [k]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_style_transfer_tpu.utils.cache import enable_compilation_cache
from pointcloud_style_transfer_tpu.ops.distance import knn

enable_compilation_cache()


def main():
    args = sys.argv[1:]
    nq = int(args[0]) if len(args) > 0 else 90112
    m = int(args[1]) if len(args) > 1 else 30000
    k = int(args[2]) if len(args) > 2 else 3
    print(f"device={jax.devices()[0]}  Nq={nq} M={m} k={k}")
    kq, kr = jax.random.split(jax.random.PRNGKey(0))
    q = jax.random.normal(kq, (1, nq, 3), jnp.float32) * 0.9
    r = jax.random.normal(kr, (1, m, 3), jnp.float32) * 0.9
    d_g, i_g = jax.jit(lambda q, r: knn(q, r, k, backend="grid"))(q, r)
    d_b, i_b = jax.jit(lambda q, r: knn(q, r, k, backend="pallas"))(q, r)
    d_g, i_g, d_b, i_b = map(np.asarray, (d_g, i_g, d_b, i_b))
    dmax = np.abs(d_g - d_b).max()
    mism = (i_g != i_b)
    print(f"max |d| diff: {dmax}")
    print(f"idx mismatches: {mism.sum()} of {i_g.size}"
          + (f" (d diff there: {np.abs(d_g - d_b)[mism].max()})"
             if mism.sum() else ""))
    # identical distances everywhere; index flips only at exact ties
    ok = dmax == 0.0 and (mism.sum() == 0
                          or np.abs(d_g - d_b)[mism].max() == 0.0)
    print("EXACTNESS (kNN):", "OK" if ok else "FAILED")

    # fused interpolation (incl. the expanded-halo second pass) vs the
    # brute kNN + XLA weighted-sum oracle: selection must be exact, values
    # agree to float-level reduction-order noise
    from pointcloud_style_transfer_tpu.ops.grid_knn import grid_knn_interpolate
    v = jax.random.normal(jax.random.PRNGKey(7), (1, m, 3), jnp.float32)
    got = np.asarray(jax.jit(
        lambda q, r, v: grid_knn_interpolate(q, r, v, k))(q, r, v))
    w = 1.0 / (np.sqrt(np.maximum(d_b, 0.0)) + 1e-8)
    w = w / w.sum(-1, keepdims=True)
    vb = np.asarray(v)
    want = (vb[0][i_b[0]] * w[0][..., None]).sum(1)[None]
    verr = np.abs(got - want).max()
    print(f"interp max |v| err: {verr}")
    ok2 = verr < 5e-4
    print("EXACTNESS (interp):", "OK" if ok2 else "FAILED")

    # layout-order variant (the sampler's composed-assembly path): the
    # re-permuted layout output must be BIT-IDENTICAL to the standard
    # entry point (same kernel pass + fallback ladder, different order)
    from pointcloud_style_transfer_tpu.ops.grid_knn import \
        grid_knn_interpolate_layout
    v_lay, qid = jax.jit(
        lambda q, r, v: grid_knn_interpolate_layout(q, r, v, k))(
            q[0], r[0], v[0])
    v_lay, qid = np.asarray(v_lay), np.asarray(qid)
    real = qid < nq
    perm_ok = np.sort(qid[real]).tolist() == list(range(nq))
    assembled = np.zeros((nq, 3), np.float32)
    assembled[qid[real]] = v_lay[real]
    lerr = np.abs(assembled - got[0]).max()
    print(f"layout-composed max |v| diff vs interp: {lerr} "
          f"(perm {'OK' if perm_ok else 'BAD'})")
    # perm_ok is a structural invariant — keep it strict. lerr compares two
    # SEPARATELY JITTED programs: identical kernel tiles and a
    # row-independent brute patch make it 0.0 today, but XLA is free to
    # reorder the IDW reduction of one program in a future release; a
    # nonzero-but-tiny lerr would mean reduction-order drift, not a
    # selection bug (selection exactness is gated by ok above). Allow
    # float-level noise like the interp gate (advisor round-4 finding).
    ok3 = perm_ok and lerr <= 1e-6
    print("EXACTNESS (layout):", "OK" if ok3 else "FAILED")

    # flat-batched path (round 5): one structure build + one kernel pass +
    # one fallback ladder over B clouds. Gate: per-cloud results equal the
    # B=1 entry point at float level and the brute oracle at selection
    # level, on heterogeneous per-cloud distributions at full size.
    from pointcloud_style_transfer_tpu.ops.grid_knn import (
        _batched_grid_ok, grid_knn_interpolate_layout_batched)
    bsz = 4
    kb = jax.random.split(jax.random.PRNGKey(11), 2 * bsz)
    scales = jnp.asarray([0.5, 0.9, 1.8, 3.0])[:, None, None]
    qb = jax.random.normal(kb[0], (bsz, nq, 3), jnp.float32) * scales
    rb = jax.random.normal(kb[1], (bsz, m, 3), jnp.float32) * scales
    vvb = jax.random.normal(jax.random.PRNGKey(13), (bsz, m, 3), jnp.float32)
    ok4 = True
    if _batched_grid_ok(bsz, nq, m, (16, 12, 8), 384, k):
        vb_lay, qidb = jax.jit(
            lambda q, r, v: grid_knn_interpolate_layout_batched(q, r, v, k))(
                qb, rb, vvb)
        vb_lay, qidb = np.asarray(vb_lay), np.asarray(qidb)
        realb = qidb < bsz * nq
        permb_ok = np.sort(qidb[realb]).tolist() == list(range(bsz * nq))
        asm = np.zeros((bsz * nq, 3), np.float32)
        asm[qidb[realb]] = vb_lay[realb]
        asm = asm.reshape(bsz, nq, 3)
        per = np.concatenate([np.asarray(jax.jit(
            lambda q, r, v: grid_knn_interpolate(q, r, v, k))(
                qb[i:i + 1], rb[i:i + 1], vvb[i:i + 1]))
            for i in range(bsz)])
        berr = np.abs(asm - per).max()
        db2, ib2 = jax.jit(lambda q, r: knn(q, r, k, backend="pallas"))(
            qb, rb)
        db2, ib2 = np.asarray(db2), np.asarray(ib2)
        wb = 1.0 / (np.sqrt(np.maximum(db2, 0.0)) + 1e-8)
        wb = wb / wb.sum(-1, keepdims=True)
        vnp = np.asarray(vvb)
        wantb = np.stack([(vnp[i][ib2[i]] * wb[i][..., None]).sum(1)
                          for i in range(bsz)])
        oerr = np.abs(asm - wantb).max()
        print(f"batched(B={bsz}) max |v| diff vs per-cloud: {berr}, "
              f"vs oracle: {oerr} (perm {'OK' if permb_ok else 'BAD'})")
        ok4 = permb_ok and berr <= 1e-6 and oerr < 5e-4
    else:
        print(f"batched path not applicable at (Nq={nq}, M={m}) — skipped")
    print("EXACTNESS (batched):", "OK" if ok4 else "FAILED")
    return 0 if (ok and ok2 and ok3 and ok4) else 1


if __name__ == "__main__":
    sys.exit(main())
