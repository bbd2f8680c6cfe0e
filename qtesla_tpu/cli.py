"""Command-line interface.

Runtime successor of the reference's CLI dispatcher (main.cu:3-8 help text,
main.cu:66-226: `-cpu N | -speedcpu N | -speedgpu N [-r seed]`), redesigned
as subcommands over a runtime parameter registry instead of compile-time
#defines:

    python -m qtesla_tpu.cli info
    python -m qtesla_tpu.cli correctness [--param-set S] [--algo A] [-r SEED]
    python -m qtesla_tpu.cli speed [--param-set S] [--algo A] [--batch B]
                                   [--iters N] [-r SEED] [--json]
    python -m qtesla_tpu.cli sweep [--param-set S] [--batches 1024,4096,...]

The reference's CPU-vs-GPU split (-speedcpu vs -speedgpu) becomes the JAX
platform: run under JAX_PLATFORMS=cpu for the host path, default for TPU.
Unlike the reference, `-r SEED` is actually used (main.cu:89-92 parses it and
never uses it).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _parameter_banner(name: str) -> str:
    from .params import get_params
    ps = get_params(name)
    return (f"{ps.name}: n={ps.n} q={ps.q} (logq={ps.q.bit_length()}) "
            f"g={ps.g} psi={ps.psi} omega={ps.omega} n_inv={ps.n_inv}")


def cmd_info(args) -> int:
    import jax
    from .params import available_param_sets
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    for name in available_param_sets():
        print(_parameter_banner(name))
    return 0


def _algos(arg: str) -> list[str]:
    from .models import ALGORITHMS
    from .ops.ntt_pairings_pallas import PAIRINGS
    kernels = ["fused", "mxu"] + [p + "_kernel" for p in sorted(PAIRINGS)]
    every = sorted(ALGORITHMS) + ["nussbaumer"] + kernels
    if arg == "all":
        import jax
        if jax.default_backend() == "tpu":
            return every
        # the Pallas kernels compile only for TPU; 'all' on CPU skips them
        return [a for a in every if a not in kernels]
    algos = arg.split(",")
    for a in algos:
        if a not in every:
            raise SystemExit(f"unknown algo {a!r}; choose from "
                             f"{every} or 'all'")
    if any(a in kernels for a in algos):
        import jax
        if jax.default_backend() != "tpu":
            bad = [a for a in algos if a in kernels]
            raise SystemExit(
                f"algo(s) {bad} are TPU-only Pallas kernels; this backend "
                f"is {jax.default_backend()!r} — use the jnp pipelines "
                f"(e.g. merged/stockham) or run on TPU")
    return algos


def cmd_correctness(args) -> int:
    """Round-trip + oracle checks (reference -cpu group and the GPU
    round-trip tests, NTT.cu:1495-1817)."""
    from .models import polymul_negacyclic
    from .oracle import all_ones_square_closed_form
    from .params import get_params
    from .utils import native

    ps = get_params(args.param_set)
    print(_parameter_banner(ps.name))
    rng = np.random.default_rng(args.seed)
    if args.random:
        x = rng.integers(0, ps.q, (args.batch, ps.n), dtype=np.uint32)
        y = rng.integers(0, ps.q, (args.batch, ps.n), dtype=np.uint32)
    else:
        # the reference's deterministic ramp fixture (NTT.cu:10-11)
        x = np.zeros((args.batch, ps.n), dtype=np.uint32)
        x[:, :ps.n // 2] = (ps.n // 2 - np.arange(ps.n // 2)) % ps.q
        y = x.copy()

    # ground truth: native C++ oracle if available, else big-int numpy
    if native.native_available():
        want = native.negacyclic_schoolbook(x, y, ps.q)
        oracle_name = "C++ schoolbook"
    else:
        from .oracle import negacyclic_schoolbook
        want = np.stack([negacyclic_schoolbook(x[b], y[b], ps)
                         for b in range(args.batch)]).astype(np.uint32)
        oracle_name = "python schoolbook"

    failures = 0
    for algo in _algos(args.algo):
        z = np.asarray(polymul_negacyclic(x, y, ps, algo=algo))
        ok = (z == want).all()
        failures += (not ok)
        print(f"  {algo:10s} vs {oracle_name}: "
              f"{'Identical.' if ok else 'INCORRECT RESULT'}")
    # known-answer fixture per requested algorithm (reference NTT.cu:1822:
    # all-ones operands whose negacyclic square has a closed form).  Same
    # batch shape as the random check so each pipeline's jit executable is
    # REUSED — on the TPU tunnel a fresh compile costs 20-40 s per algo,
    # which used to double this command's wall time.
    ones = np.ones((args.batch, ps.n), dtype=np.uint32)
    want1 = all_ones_square_closed_form(ps)
    for algo in _algos(args.algo):
        z1 = np.asarray(polymul_negacyclic(ones, ones, ps, algo=algo))
        ok = (z1[0].astype(np.uint64) == want1).all()
        failures += (not ok)
        print(f"  {algo:10s} all-ones closed form: "
              f"{'Identical.' if ok else 'INCORRECT'}")
    return 1 if failures else 0


def _speed_row(tag: str, r, batch: int) -> dict:
    """One JSON result row of `cli speed` — single definition so the key
    schema cannot drift between the default/fixed/streamed branches."""
    return {"algo": tag, "batch": batch,
            "min_ms_per_iter": r.min_s * 1e3,
            "median_ms_per_iter": (r.median_s or r.mean_s) * 1e3,
            "polymuls_per_s": r.throughput_best}


def cmd_speed(args) -> int:
    """Steady-state throughput (reference -speedcpu/-speedgpu groups)."""
    import jax
    from .utils.timing import benchmark_polymul
    print(f"backend: {jax.default_backend()}")
    print(_parameter_banner(args.param_set))
    if getattr(args, "streamed", False) and args.trace_dir:
        print("  NOTE: --trace-dir is ignored in --streamed mode (the "
              "transfer-inclusive loop is host-driven; profile the "
              "device-resident path instead)")
    if getattr(args, "fixed", False):
        import jax.numpy as jnp
        from .models import polymul_fixed_fn
        from .params import get_params
        from .utils.timing import measure
        ps = get_params(args.param_set)
        rng = np.random.default_rng(args.seed)
        # fixed-operand pairs exist for 'mxu'/'fused' (TPU) and 'merged';
        # 'all'/comma lists are filtered the same way the CPU guard works
        # 'mxu-folded' exists only as a fixed-operand variant, so it is
        # parsed here rather than in the shared _algos registry
        toks = [t.strip() for t in args.algo.split(",")]
        folded = [t for t in toks if t == "mxu-folded"]
        rest = ",".join(t for t in toks if t != "mxu-folded")
        requested = (_algos(rest) if rest else []) + folded
        fixed_algos = [a for a in requested if a in ("mxu", "mxu-folded",
                                                     "fused", "merged")]
        # 'all' predates the folded variant; include it whenever mxu runs
        if "mxu" in fixed_algos and "mxu-folded" not in fixed_algos:
            fixed_algos.append("mxu-folded")
        for a in requested:
            if a not in fixed_algos:
                print(f"  {a:10s} SKIP (no fixed-operand variant; "
                      "available: mxu, mxu-folded, fused, merged)")
        if not fixed_algos:
            return 1
        out = []
        for algo in fixed_algos:
            prep, mul = polymul_fixed_fn(ps.name, algo)
            A = prep(jnp.asarray(
                rng.integers(0, ps.q, (1, ps.n), dtype=np.uint32)))
            if algo != "mxu-folded":
                A = A[0]        # (1, n) spectrum -> (n,); folded prep
                                # returns the (W', const') table pair
            xh = rng.integers(0, ps.q, (args.batch, ps.n), dtype=np.uint32)
            if getattr(args, "streamed", False):
                # fixed + streamed: the qTESLA-verification serving bracket —
                # the public-key spectrum A stays device-resident while each
                # iteration stages a fresh operand batch from host RAM and
                # fetches the product back (reference's transfer-inclusive
                # bracket, NTT.cu:2036-2079, for the fixed-operand pipeline)
                from .utils.timing import measure_streamed
                r = measure_streamed(lambda c, mul=mul, A=A: mul(c, A), xh,
                                     warmup=2, iters=args.iters,
                                     items_per_iter=args.batch,
                                     name=f"polymul_fixed_streamed[{ps.name},"
                                          f"{algo},B={args.batch}]")
                tag = f"fixed_streamed/{algo}"
            else:
                x = jnp.asarray(xh)
                r = measure(lambda _, c, mul=mul, A=A: mul(c, A), x, x,
                            warmup=2, iters=args.iters,
                            items_per_iter=args.batch, chain=True,
                            trace_dir=args.trace_dir,
                            name=f"polymul_fixed[{ps.name},{algo},"
                                 f"B={args.batch}]")
                tag = f"fixed/{algo}"
            out.append(_speed_row(tag, r, args.batch))
            print("  " + r.line())
        if args.json:
            print(json.dumps(out))
        return 0
    out = []
    if getattr(args, "streamed", False):
        from .utils.timing import benchmark_polymul_streamed
        for algo in _algos(args.algo):
            r = benchmark_polymul_streamed(args.param_set, algo,
                                           batch=args.batch,
                                           iters=args.iters, seed=args.seed)
            out.append(_speed_row(f"streamed/{algo}", r, args.batch))
            print("  " + r.line())
        if args.json:
            print(json.dumps(out))
        return 0
    for algo in _algos(args.algo):
        r = benchmark_polymul(args.param_set, algo, batch=args.batch,
                              iters=args.iters, seed=args.seed,
                              trace_dir=args.trace_dir)
        out.append(_speed_row(algo, r, args.batch))
        print("  " + r.line())
    if args.json:
        print(json.dumps(out))
    return 0


def cmd_sweep(args) -> int:
    """Batch-size scaling sweep (analog of reference -speedgpu 8's repeated
    headline benchmark, main.cu:213-225, generalized)."""
    from .utils.timing import benchmark_polymul
    print(_parameter_banner(args.param_set))
    batches = [int(b) for b in args.batches.split(",")]
    for algo in _algos(args.algo):
        for b in batches:
            r = benchmark_polymul(args.param_set, algo, batch=b,
                                  iters=args.iters, seed=args.seed)
            print("  " + r.line())
    return 0


def cmd_scaling(args) -> int:
    """Data-parallel scaling efficiency over the available devices (the
    BASELINE.md north-star harness: polymuls/s at 1 device vs d devices).

    Two batch policies:
      --batch-per-device B : global batch grows with d (weak scaling) —
        the pod-measurement mode; scaling_eff = agg(d) / (agg(1) * d).
      --global-batch B     : global batch FIXED, sharded over d (the
        honest mode for VIRTUAL devices: on an m-core host, d virtual
        devices share the cores, so aggregate throughput cannot grow with
        d — the meaningful statistic is relative overhead vs 1 device,
        reported as overhead_eff = agg(d) / agg(1), expected ~1.0).

    Every JSON row carries `virtual_devices` (true when the devices are
    host-platform CPU threads) and, when true, `host_cores` + a `caveat`
    string — so the artifact can never be misread as ICI scaling
    (round-3 VERDICT item: the recorded dp@8=0.30 was 8 virtual devices
    contending on one core, with nothing in the JSON saying so)."""
    import os
    import jax
    from .parallel import make_mesh
    from .parallel.sharded import polymul_dp_fn, polymul_fourstep_sharded_fn
    from .params import get_params
    from .utils.timing import measure

    ps = get_params(args.param_set)
    print(_parameter_banner(ps.name))
    ndev = len(jax.devices())
    virtual = (jax.default_backend() == "cpu"
               and "host_platform_device_count" in os.environ.get(
                   "XLA_FLAGS", ""))
    cores = os.cpu_count() or 1
    print(f"backend: {jax.default_backend()}  devices: {ndev}"
          + (f"  (VIRTUAL, {cores} host cores)" if virtual else ""))
    fixed_global = getattr(args, "global_batch", 0) or 0
    rng = np.random.default_rng(args.seed)

    def annotate(row):
        row["virtual_devices"] = virtual
        if virtual:
            row["host_cores"] = cores
            row["caveat"] = (
                "virtual CPU devices sharing host cores: validates the "
                "sharded code path and relative overhead, NOT ICI scaling")
        return row

    out = []
    base = None
    d = 1
    # On virtual devices that outnumber the host cores, dp rows at d > 2
    # are pure contention noise (round-4's 0.88/1.16/1.15 spread exceeded
    # the effect measured): emit only d in {1, 2} there, with min-of-N
    # statistics — contention can only inflate a repeat, so the min is the
    # repeatable estimate (VERDICT r4 item 7).
    contended = virtual and ndev > cores
    dmax = min(ndev, 2) if contended else ndev
    while d <= dmax:
        mesh = make_mesh(data=d, model=1)
        B = fixed_global if fixed_global else args.batch_per_device * d
        if B % d:
            d *= 2
            continue
        x = rng.integers(0, ps.q, (B, ps.n), dtype=np.uint32)
        y = rng.integers(0, ps.q, (B, ps.n), dtype=np.uint32)
        fn = polymul_dp_fn(ps.name, mesh, algo=args.algo)
        r = measure(fn, x, y, warmup=2, iters=args.iters, items_per_iter=B,
                    chain=True, repeats=5 if contended else 3,
                    name=f"dp[d={d},B={B},{args.algo}]")
        # min-based on contended virtual hosts (repeatability), median-based
        # otherwise (robust central tendency on real devices)
        tput = r.throughput_best if contended else r.throughput
        if base is None:
            base = tput
        row = {"mode": "dp", "devices": d, "batch": B,
               "polymuls_per_s": tput}
        if fixed_global:
            row["overhead_eff"] = tput / base
            print(f"  {r.line()}  overhead-eff {row['overhead_eff']:5.1%}")
        else:
            row["scaling_eff"] = tput / (base * d)
            print(f"  {r.line()}  scaling-eff {row['scaling_eff']:5.1%}")
        out.append(annotate(row))
        d *= 2
    if args.model > 1:
        if ndev < args.model or ndev % args.model:
            print(f"  fourstep SP skipped: model={args.model} needs a "
                  f"divisible device count, have {ndev}")
        else:
            mesh = make_mesh(data=ndev // args.model, model=args.model)
            B = (fixed_global if fixed_global
                 else args.batch_per_device * mesh.shape["data"])
            x = rng.integers(0, ps.q, (B, ps.n), dtype=np.uint32)
            y = rng.integers(0, ps.q, (B, ps.n), dtype=np.uint32)
            fn = polymul_fourstep_sharded_fn(ps.name, mesh)
            r = measure(fn, x, y, warmup=2, iters=args.iters,
                        items_per_iter=B, chain=True,
                        repeats=5 if contended else 3,
                        name=f"fourstep[data={mesh.shape['data']},"
                             f"model={args.model},B={B}]")
            # vs the DP aggregate at the same device count; same statistic
            # as the dp rows (min-based under contention)
            tput = r.throughput_best if contended else r.throughput
            denom = base if fixed_global else base * ndev
            rel = tput / denom if base else 0.0
            out.append(annotate({
                "mode": "fourstep_sp",
                "devices": ndev, "model": args.model, "batch": B,
                "polymuls_per_s": tput,
                "vs_dp_eff": rel}))
            print(f"  {r.line()}  vs-dp {rel:5.1%}")
            # Ulysses SP (parallel/ulysses.py): batch<->position transpose
            # + the unmodified single-chip pipeline — the default SP
            # strategy for B >= devices; same ICI bytes as four-step
            if B >= ndev:
                from .parallel import polymul_ulysses_fn
                fnu = polymul_ulysses_fn(ps.name, mesh, local=args.algo)
                ru = measure(fnu, x, y, warmup=2, iters=args.iters,
                             items_per_iter=B, chain=True,
                             repeats=5 if contended else 3,
                             name=f"ulysses[data={mesh.shape['data']},"
                                  f"model={args.model},B={B}]")
                tputu = ru.throughput_best if contended else ru.throughput
                relu = tputu / denom if base else 0.0
                out.append(annotate({
                    "mode": "ulysses_sp",
                    "devices": ndev, "model": args.model, "batch": B,
                    "polymuls_per_s": tputu,
                    "vs_dp_eff": relu}))
                print(f"  {ru.line()}  vs-dp {relu:5.1%}")
    if args.json:
        print(json.dumps(out))
    return 0


def cmd_microbench(args) -> int:
    """Modular-reduction primitive throughput (reference red_assembly /
    -speedgpu 7, NTT.cu:282-377, main.cu:211-212)."""
    from .utils.timing import benchmark_reduction
    print(_parameter_banner(args.param_set))
    for op in ["addmod", "mulhi", "shoup", "barrett"]:
        r = benchmark_reduction(args.param_set, op, size=args.size,
                                iters=args.iters, seed=args.seed)
        print(f"  {op:8s}: {r.min_s * 1e6:8.1f} us/iter best -> "
              f"{r.throughput_best / 1e9:6.2f} Gelem/s")
    return 0


def main(argv=None) -> int:
    # honor JAX_PLATFORMS even when a sitecustomize imported jax at startup
    # (env alone is too late then; the config update still works pre-query)
    import os
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    p = argparse.ArgumentParser(
        prog="qtesla_tpu",
        description="TPU-native qTESLA negacyclic polynomial multiplication")
    p.add_argument("--distributed", action="store_true",
                   help="initialize jax.distributed before any device query "
                        "(multi-host pods; reads JAX_COORDINATOR_ADDRESS / "
                        "JAX_NUM_PROCESSES / JAX_PROCESS_ID or the cloud "
                        "metadata)")
    p.add_argument("--register", action="append", default=[],
                   metavar="NAME:n:q",
                   help="register an extra parameter set at runtime "
                        "(power-of-two n, prime q = 1 mod 2n; repeatable) "
                        "— e.g. --register qtesla3s-8192:8192:8404993; "
                        "the CLI equivalent of params.register_param_set, "
                        "replacing the reference's compile-time ladder "
                        "(main.cu:18-65)")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("info", help="parameter banner for all registered sets")

    def common(sp, batch_default):
        sp.add_argument("--param-set", default="qtesla-iii-speed")
        sp.add_argument("--algo", default="merged",
                        help="algorithm name, comma list, or 'all'")
        sp.add_argument("--batch", type=int, default=batch_default)
        sp.add_argument("-r", "--seed", type=int, default=0)

    c = sub.add_parser("correctness", help="oracle + known-answer checks")
    common(c, 4)
    c.add_argument("--random", action="store_true",
                   help="random operands instead of the ramp fixture")

    s = sub.add_parser("speed", help="steady-state throughput benchmark")
    common(s, 4096)
    s.add_argument("--iters", type=int, default=20)
    s.add_argument("--fixed", action="store_true",
                   help="fixed-operand workload (constant polynomial, "
                        "precomputed spectrum)")
    s.add_argument("--streamed", action="store_true",
                   help="transfer-inclusive bracket: operands staged from "
                        "host RAM and result fetched back every iteration "
                        "(the reference's PCIe-inclusive timing, "
                        "NTT.cu:2036-2079)")
    s.add_argument("--json", action="store_true")
    s.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler trace here")

    w = sub.add_parser("sweep", help="batch-size scaling sweep")
    common(w, 0)
    w.add_argument("--batches", default="1024,4096,16384,65536")
    w.add_argument("--iters", type=int, default=10)

    g = sub.add_parser("scaling",
                       help="multi-device DP/SP scaling efficiency")
    g.add_argument("--param-set", default="qtesla-iii-speed")
    g.add_argument("--algo", default="merged")
    g.add_argument("--batch-per-device", type=int, default=4096)
    g.add_argument("--global-batch", type=int, default=0,
                   help="fix the GLOBAL batch (sharded over devices) "
                        "instead of growing it per device — the honest "
                        "mode for virtual-device runs (see cmd_scaling)")
    g.add_argument("--iters", type=int, default=10)
    g.add_argument("--model", type=int, default=1,
                   help="also run the four-step SP pipeline at this "
                        "model-axis size")
    g.add_argument("--json", action="store_true")
    g.add_argument("-r", "--seed", type=int, default=0)

    m = sub.add_parser("microbench",
                       help="modular-reduction primitive throughput")
    m.add_argument("--param-set", default="qtesla-iii-speed")
    m.add_argument("--size", type=int, default=1 << 22)
    m.add_argument("--iters", type=int, default=50)
    m.add_argument("-r", "--seed", type=int, default=0)

    args = p.parse_args(argv)
    for spec in args.register:
        try:
            nm, nn, qq = spec.rsplit(":", 2)
            from .params import register_param_set
            register_param_set(nm, n=int(nn), q=int(qq))
        except ValueError as e:
            raise SystemExit(f"--register {spec!r}: {e}") from e
    if args.distributed:
        from .parallel import init_distributed
        init_distributed()
    return {"info": cmd_info, "correctness": cmd_correctness,
            "speed": cmd_speed, "sweep": cmd_sweep, "scaling": cmd_scaling,
            "microbench": cmd_microbench}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
