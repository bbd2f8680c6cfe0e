"""Driver benchmark: steady-state batched negacyclic polymul throughput on
one chip, qTESLA-III-speed (n=1024) — the reference's headline metric
(polymuls/s, NTT.cu:2083) measured the TPU way (warmup excluded, device-
synchronous timing, large resident batch instead of the reference's
BATCH=2-with-PCIe loop).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "polymuls/s/chip", "vs_baseline": N}

CONTRACT: the JSON line is the LAST line on stdout — every diagnostic
(stderr) and subprocess runs BEFORE it, so a tail-window capture of the
output always contains the headline (round-3 regression: the JSON printed
first and ~18 diagnostic lines scrolled it out of the driver's capture;
BENCH_r03.json recorded parsed=null).

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
denominator is REFERENCE_ESTIMATE = 1e6 polymuls/s — a generous estimate of
the reference-class GPU pipeline's throughput at this n (its shipped config
measures 2 polymuls per timed loop including PCIe transfers).
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))

REFERENCE_ESTIMATE = 1.0e6   # polymuls/s, see module docstring

PARAM_SET = "qtesla-iii-speed"
BATCHES = (16384, 32768, 65536)
# the axon tunnel's device->host readback costs ~25 ms per chained run;
# 400 in-device iterations amortize it below 0.1 ms/iter
ITERS = 400


def pick_algo() -> str:
    """Prefer the MXU int8-matmul kernel on TPU; the Pallas kernels only
    compile for TPU (polymul_fn construction is lazy, so a try/except
    around it cannot detect backend support)."""
    import jax
    try:
        if jax.default_backend() == "tpu":
            return "mxu"
    except Exception:
        pass
    return "merged"


def _diag(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _diagnostics(best_algo: str, batch: int, t_flag_best: float) -> None:
    """All stderr diagnostic measurements.  Each block is individually
    guarded: a diagnostic failure must never cost the headline JSON (which
    main() prints AFTER this returns, as the last stdout line)."""
    from qtesla_tpu.utils.timing import benchmark_polymul

    extras = []
    if best_algo == "mxu":
        extras.append((PARAM_SET, "fused", BATCHES[0]))
    if best_algo != "merged":
        extras.append((PARAM_SET, "merged", BATCHES[0]))
    extras += [(s, best_algo, BATCHES[0]) for s in ("qtesla-i", "qtesla-p-i",
                                                    "qtesla-p-iii")]
    # the paper's title algorithm (reference NTT.cu:147-277) — recorded so
    # the Nussbaumer path has a committed TPU number, not just correctness.
    # B=512 = one lanes=batch chunk (larger batches run as chunked lax.map
    # with batch-independent throughput)
    extras.append((PARAM_SET, "nussbaumer", 512))
    for pset, candidate, batch_d in extras:
        try:
            r = benchmark_polymul(pset, candidate, batch=batch_d,
                                  iters=ITERS)
            _diag(r.line())
        except Exception as e:
            _diag(f"{pset}/{candidate} failed: {e}")
    if best_algo != "mxu":
        return
    # fixed-operand workload (constant polynomial, spectrum precomputed)
    try:
        import jax.numpy as jnp
        import numpy as np
        from qtesla_tpu.models import polymul_fixed_fn
        from qtesla_tpu.params import get_params
        from qtesla_tpu.utils.timing import measure
        ps = get_params(PARAM_SET)
        rng = np.random.default_rng(0)
        prep, mul = polymul_fixed_fn(PARAM_SET, "mxu")
        A = prep(jnp.asarray(rng.integers(
            0, ps.q, (1, ps.n), dtype=np.uint32)))[0]
        x = jnp.asarray(rng.integers(0, ps.q, (BATCHES[0], ps.n),
                                     dtype=np.uint32))
        r = measure(lambda _, c: mul(c, A), x, x, warmup=2, iters=ITERS,
                    items_per_iter=BATCHES[0], chain=True,
                    name=f"polymul_fixed[{PARAM_SET},mxu,"
                         f"B={BATCHES[0]}]")
        _diag(r.line())
        # round-3 constant-folded variant: the pointwise diagonal lives
        # inside per-constant inverse matmul tables (no pointwise stage)
        prep_f, mul_f = polymul_fixed_fn(PARAM_SET, "mxu-folded")
        Af = prep_f(jnp.asarray(rng.integers(
            0, ps.q, (1, ps.n), dtype=np.uint32)))
        r = measure(lambda _, c: mul_f(c, Af), x, x, warmup=2,
                    iters=ITERS, items_per_iter=BATCHES[0], chain=True,
                    name=f"polymul_fixed[{PARAM_SET},mxu-folded,"
                         f"B={BATCHES[0]}]")
        _diag(r.line())
    except Exception as e:
        _diag(f"fixed-operand failed: {e}")
    # generality beyond the reference's N=4..1024 ladder: the Dilithium
    # prime, registered at runtime, through the same flagship kernel
    try:
        from qtesla_tpu.params import register_param_set
        register_param_set("dilithium-256", n=256, q=8380417)
        r = benchmark_polymul("dilithium-256", "mxu", batch=BATCHES[0],
                              iters=ITERS)
        _diag(r.line())
    except Exception as e:
        _diag(f"dilithium-256 failed: {e}")
    # SP trend (round-2 VERDICT item 4): per-chip local pipeline of the
    # sharded four-step (the B < k fallback) vs the flagship —
    # tax = k*t_local/t_flagship
    flag = {PARAM_SET: t_flag_best}
    try:
        from qtesla_tpu.utils.timing import benchmark_polymul as _bp
        from qtesla_tpu.utils.timing import benchmark_sp_local
        for pset, k in ((PARAM_SET, 2), (PARAM_SET, 4), (PARAM_SET, 8),
                        ("qtesla-p-iii", 4)):
            if pset not in flag:
                flag[pset] = BATCHES[0] / _bp(
                    pset, "mxu", batch=BATCHES[0],
                    iters=ITERS).throughput_best
            r, _ = benchmark_sp_local(pset, k, batch=BATCHES[0],
                                      iters=ITERS)
            tax = k * r.min_s / flag[pset]
            norm = BATCHES[0] / (k * r.min_s)
            _diag(f"{r.line()}  SP-tax {tax:.2f}x  per-chip-norm "
                  f"{norm / 1e6:.2f} M/s")
    except Exception as e:
        _diag(f"sp_local failed: {e}")
    # Ulysses-style SP (batch<->position transpose + local flagship kernel,
    # parallel/ulysses.py): the default SP strategy for B >= k; local
    # surface = the flagship at B/k, so the tax is the kernel's own
    # sub-batch efficiency
    try:
        from qtesla_tpu.utils.timing import benchmark_ulysses_local
        for pset, k in ((PARAM_SET, 2), (PARAM_SET, 4), (PARAM_SET, 8),
                        ("qtesla-p-iii", 4), ("qtesla-p-iii", 8)):
            r = benchmark_ulysses_local(pset, k, batch=BATCHES[0],
                                        iters=ITERS)
            tax = k * r.min_s / flag.get(pset, t_flag_best)
            norm = BATCHES[0] / (k * r.min_s)
            _diag(f"{r.line()}  SP-tax {tax:.2f}x  per-chip-norm "
                  f"{norm / 1e6:.2f} M/s")
    except Exception as e:
        _diag(f"ulysses_local failed: {e}")
    # fixed-operand SP local surface (round-3 VERDICT item 7): the
    # four-step SP fixed path's per-chip pipeline (one fwd + one inv)
    try:
        from qtesla_tpu.utils.timing import benchmark_sp_local_fixed
        r, _ = benchmark_sp_local_fixed(PARAM_SET, 4, batch=BATCHES[0],
                                        iters=ITERS)
        _diag(r.line())
    except Exception as e:
        _diag(f"sp_local_fixed failed: {e}")


def _cpu_mesh_validation() -> None:
    """CPU-mesh DP/SP relative throughput.  VIRTUAL devices on this host's
    single core: validates the sharded code path and records relative
    overhead, NOT ICI scaling (the JSON rows carry virtual_devices/caveat
    fields; see cli.cmd_scaling)."""
    try:
        import subprocess
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=8")
        cp = subprocess.run(
            [sys.executable, "-m", "qtesla_tpu.cli", "scaling",
             "--param-set", "qtesla-iii-speed", "--global-batch", "2048",
             "--iters", "10", "--model", "4", "--json"],
            capture_output=True, text=True, timeout=1500, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        tail = [ln for ln in cp.stdout.strip().splitlines() if ln]
        if cp.returncode == 0 and tail:
            _diag(f"cpu-mesh scaling: {tail[-1]}")
        else:
            _diag(f"cpu-mesh scaling failed: rc={cp.returncode} "
                  f"{cp.stderr[-200:]}")
    except Exception as e:
        _diag(f"cpu-mesh scaling failed: {e}")


def main() -> int:
    from qtesla_tpu.utils.timing import benchmark_polymul

    algo = pick_algo()
    best = None
    configs = [(algo, b) for b in BATCHES]
    # fallback ladder: if every config of the preferred algorithm fails,
    # try the next algorithm before reporting zero
    for fb in ("fused", "merged"):
        if fb != algo:
            configs.append((fb, BATCHES[0]))
    for candidate, batch in configs:
        if best is not None and candidate != algo:
            continue                 # fallbacks only engage on total failure
        try:
            r = benchmark_polymul(PARAM_SET, candidate, batch=batch,
                                  iters=ITERS)
        except Exception as e:
            _diag(f"{candidate} B={batch} failed: {e}")
            continue
        _diag(r.line())
        if best is None or r.throughput_best > best[2].throughput_best:
            best = (candidate, batch, r)
    if best is None:
        print(json.dumps({"metric": "polymul_throughput", "value": 0,
                          "unit": "polymuls/s/chip", "vs_baseline": 0}),
              flush=True)
        return 1
    best_algo, batch, r = best
    value = r.throughput_best          # min-time based; see timing.py
    # every diagnostic (stderr) runs BEFORE the headline JSON so the JSON
    # is the last stdout line; each block is exception-guarded so nothing
    # here can cost the headline
    try:
        _diagnostics(best_algo, batch, BATCHES[0] * best[2].min_s / best[1])
    except Exception as e:
        _diag(f"diagnostics failed: {e}")
    _cpu_mesh_validation()
    # honest denominators next to the estimated one: the kernel's own
    # measured in-Pallas DMA floor and estimated VPU op-count floor at this
    # shape (docs/PERF_NOTES.md round-2 correction) — vs_baseline divides by
    # an ESTIMATE (the reference publishes no numbers), these divide by
    # measured properties of this chip
    print(json.dumps({
        "metric": f"negacyclic polymuls/s/chip (n=1024, q=8404993, "
                  f"batch={batch}, algo={best_algo})",
        "value": round(value, 1),
        "unit": "polymuls/s/chip",
        "vs_baseline": round(value / REFERENCE_ESTIMATE, 3),
        "baseline_is_estimate": True,
        "vs_dma_floor_45M": round(value / 45.0e6, 3),
        "vs_op_floor_20M": round(value / 20.0e6, 3),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
