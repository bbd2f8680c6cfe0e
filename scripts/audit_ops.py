"""Static per-phase VPU op audit of the flagship MXU polymul kernel.

Traces each kernel phase (the REAL building blocks from ops/ntt_mxu.py,
which are plain jnp functions) with jax.make_jaxpr and counts the primitive
lane ops XLA/Mosaic must issue — multiplies, add/sub, shifts, masks,
compares/selects, converts — plus MXU MACs and layout ops (slices/concats)
separately.  Because it traces the emission code itself, the audit can
never drift from what the kernel actually does.

Purpose (round-3 VERDICT item 2): commit the evidence that the kernel is
VPU-compute-bound at its op count — the per-phase op budget here, times the
measured VPU issue rate, reproduces the measured compute_only time from
scripts/probe_mxu.py.  Run on any backend (trace-only, no device compute):

    JAX_PLATFORMS=cpu python scripts/audit_ops.py [--param-set NAME]

Reference metric anchor: the pipeline this audits is the TPU rebirth of the
reference's 21-launch GPU polymul (NTT.cu:2097-2178); its throughput line
is NTT.cu:2083.
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qtesla_tpu.ops import ntt_mxu as M  # noqa: E402

# one VPU lane-op each (8x128 lanes/cycle class); convert/bitcast included
# because Mosaic issues them as real vector ops
_VPU = {
    "mul": 1, "add": 1, "sub": 1, "shift_left": 1,
    "shift_right_logical": 1, "shift_right_arithmetic": 1,
    "and": 1, "or": 1, "xor": 1, "ge": 1, "gt": 1, "le": 1, "lt": 1,
    "select_n": 1, "convert_element_type": 1, "bitcast_convert_type": 1,
    "neg": 1, "min": 1, "max": 1,
}
_LAYOUT = {"slice", "concatenate", "reshape", "broadcast_in_dim",
           "squeeze", "transpose", "pad", "dynamic_slice"}


def _count(jaxpr, counts):
    for eqn in jaxpr.eqns:
        nm = eqn.primitive.name
        if nm in ("pjit", "closed_call", "custom_jvp_call"):
            for p in eqn.params.values():
                if hasattr(p, "jaxpr"):
                    _count(p.jaxpr, counts)
            continue
        size = max((int(np.prod(v.aval.shape)) for v in eqn.outvars
                    if hasattr(v.aval, "shape")), default=0)
        if nm == "dot_general":
            a, b = (v.aval.shape for v in eqn.invars[:2])
            counts["macs"] = counts.get("macs", 0) + int(
                np.prod(a) * b[-1])
            continue
        if nm in _LAYOUT:
            counts["layout"] = counts.get("layout", 0) + size
            continue
        if nm in _VPU:
            counts[nm] = counts.get(nm, 0) + size * _VPU[nm]


def count_ops(fn, *avals):
    jaxpr = jax.make_jaxpr(fn)(*avals)
    counts: dict[str, int] = {}
    _count(jaxpr.jaxpr, counts)
    return counts


def phase_table(name: str, tb: int = 256):
    mt = M.get_mxu_tables(name)
    n, q = mt.n, mt.q
    blk = jax.ShapeDtypeStruct((tb, mt.bw), jnp.uint32)
    blocks = [blk] * mt.nb
    wf = jax.ShapeDtypeStruct(mt.wf.shape, jnp.int8)
    cf = jax.ShapeDtypeStruct(mt.constf.shape, jnp.uint32)
    wi = jax.ShapeDtypeStruct(mt.wi.shape, jnp.int8)
    ci = jax.ShapeDtypeStruct(mt.consti.shape, jnp.uint32)

    def fwd_rolls(*bs):
        return M._fwd_rolls(list(bs), mt)

    def fwd_matmul(w, c, *bs):
        out, _ = M._block_matmul(list(bs), w, c, mt, mt.groups_f,
                                 mt.bounds_f, mt.fwd_off, mt.Df,
                                 mt.fwd_base)
        return out

    def pointwise(*bs):
        xs, ys = bs[:mt.nb], bs[mt.nb:]
        return [M._pointwise(x, y, mt) for x, y in zip(xs, ys)]

    def inv_matmul(w, c, *bs):
        out, rb = M._block_matmul(list(bs), w, c, mt, mt.groups_i,
                                  mt.bounds_i, mt.inv_off, mt.Di,
                                  mt.inv_base)
        return [M.reduce_bounded_2q(v, rb, q, mt.tbl.ps.one_shoup)
                for v in out]

    def inv_rolls(*bs):
        return M._inv_rolls(list(bs), mt)

    phases = [
        ("fwd wide stages (x2 ops)", 2, count_ops(fwd_rolls, *blocks)),
        ("fwd split+dots+recombine (x2)", 2,
         count_ops(fwd_matmul, wf, cf, *blocks)),
        ("pointwise", 1, count_ops(pointwise, *(blocks * 2))),
        ("inv split+dots+recombine+reduce", 1,
         count_ops(inv_matmul, wi, ci, *blocks)),
        ("inv wide stages", 1, count_ops(inv_rolls, *blocks)),
    ]
    coeffs = tb * n
    rows = []
    tot_vpu = tot_mac = tot_lay = 0
    for label, mult, c in phases:
        vpu = sum(v for k, v in c.items() if k not in ("macs", "layout"))
        muls = c.get("mul", 0)
        rows.append((label, mult, vpu * mult / coeffs,
                     muls * mult / coeffs,
                     c.get("macs", 0) * mult / coeffs,
                     c.get("layout", 0) * mult / coeffs))
        tot_vpu += vpu * mult
        tot_mac += c.get("macs", 0) * mult
        tot_lay += c.get("layout", 0) * mult
    return mt, rows, (tot_vpu / coeffs, tot_mac / coeffs, tot_lay / coeffs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--param-set", default="qtesla-iii-speed")
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16384,
                    help="batch for the projected-time lines")
    ap.add_argument("--vpu-rate", type=float, default=3.9e12,
                    help="VPU lane ops/s (v5e: 8x128 lanes x 4 ALUs x "
                         "~0.95 GHz; matches the measured in-kernel "
                         "sloppy-Shoup rate, docs/PERF_NOTES.md)")
    ap.add_argument("--mxu-rate", type=float, default=197e12,
                    help="int8 MACs/s (v5e: 394 TOPS = 197 T MAC/s)")
    args = ap.parse_args()
    mt, rows, (vpu, macs, lay) = phase_table(args.param_set, args.tile)
    print(f"# {args.param_set}: n={mt.n} q={mt.q} D={mt.D} bw={mt.bw} "
          f"Lr={mt.Lr} Df={mt.Df}@{mt.fwd_base} Di={mt.Di}@{mt.inv_base} "
          f"tile={args.tile}")
    print(f"{'phase':36s} {'VPU ops':>8s} {'muls':>6s} {'MACs':>7s} "
          f"{'layout':>7s}   (per coefficient)")
    for label, _, v, m, mc, ly in rows:
        print(f"{label:36s} {v:8.1f} {m:6.1f} {mc:7.0f} {ly:7.1f}")
    print(f"{'TOTAL':36s} {vpu:8.1f} {macs + 0:7.0f} MACs {lay:7.1f}")
    B = args.batch
    t_vpu = B * mt.n * vpu / args.vpu_rate * 1e3
    t_mxu = B * mt.n * macs / args.mxu_rate * 1e3
    print(f"projected @ B={B}: VPU {t_vpu:.3f} ms serial, "
          f"MXU {t_mxu:.3f} ms (overlapped)  "
          f"-> op-floor {B / (t_vpu / 1e3) / 1e6:.1f} M polymuls/s "
          f"if every lane op issues at peak")


if __name__ == "__main__":
    main()
