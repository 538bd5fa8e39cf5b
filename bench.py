"""Single-chip benchmark: ICC/NTT erasure-encode + Pippenger MSM.

Prints one JSON line per metric: {"metric", "value", "unit",
"vs_baseline"}. The LAST line is the BASELINE.json primary metric (MSM
points/sec/chip, BN254, 2^20).

Metrics:
- icc_encode_coeffs_per_s: all radix-2 NTT stages over a (n, 128-chunk)
  block array in both CRT lanes (mod p and mod q) — one full codeword
  build, the compute core of the protocol's hot loop (CRebuild).
- msm_points_per_s_{secp256k1,bn254}: 2^20-point 256-bit variable-base
  MSM through the blinded Pippenger bucket kernel (the audit-combine /
  KZG-commit hot op; reference porla/main.go:118-138,
  porla/Utils/secp256k1_lib/ecmult_impl.h:814-861). Each run is
  verified against the exact golden model before timing.

vs_baseline compares against estimates of the reference's 8-thread CPU
throughput for the same op (see BENCH_NOTES.md for derivations). MSM
runs are skipped on the CPU fallback path (interpret-mode kernels are
not a measurement).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

def _probe_backend() -> None:
    """The axon TPU relay can be down; jax initialization then hangs or
    raises inside this process. Probe device init in a SUBPROCESS with a
    timeout, RETRYING with backoff through transient relay flaps
    (~25 min total by default; PORLA_BENCH_MAX_WAIT seconds to override).
    Only after the full retry window falls back to the CPU backend (axon
    plugin stripped from PYTHONPATH, since with the plugin importable
    JAX_PLATFORMS is ignored) so the bench always emits its JSON line —
    marked "fallback": true with vs_baseline null (a CPU number is not
    comparable to the per-chip baseline; round-1 lesson)."""
    import subprocess
    import sys
    if os.environ.get("PORLA_BENCH_NO_PROBE") == "1":
        return
    deadline = time.monotonic() + float(
        os.environ.get("PORLA_BENCH_MAX_WAIT", "1500"))
    sleep_s = 15.0
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=420, capture_output=True)
            if r.returncode == 0:
                return
            detail = (r.stderr or b"").decode(errors="replace")[-200:]
        except subprocess.TimeoutExpired:
            detail = "probe timeout (420s)"
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        print(f"WARN: device probe attempt {attempt} failed ({detail}); "
              f"retrying in {sleep_s:.0f}s ({remaining:.0f}s left)",
              flush=True)
        time.sleep(min(sleep_s, max(remaining, 1.0)))
        sleep_s = min(sleep_s * 2, 240.0)
    print("WARN: device backend unavailable after retries; "
          "falling back to CPU (fallback-labeled result)", flush=True)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PORLA_BENCH_NO_PROBE"] = "1"
    env["PORLA_BENCH_FALLBACK"] = "1"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and "axon" not in p)
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
              env)


_probe_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REFERENCE_CPU_COEFFS_PER_S = 1.2e6  # estimated; BENCH_NOTES.md
# 8-thread CPU Pippenger estimates at 2^20 (BENCH_NOTES.md "MSM baseline
# denominators"): libsecp256k1 ecmult_multi ~1.0e6 pts/s; gnark-crypto
# BN254 MultiExp (ADX asm) ~2.0e6 pts/s
REFERENCE_CPU_MSM_PTS_PER_S = {"secp256k1": 1.0e6, "bn254": 2.0e6}


def bench_msm(curve_name: str, n: int = 1 << 20) -> dict:
    """Number-of-record policy (MSM_r04.json): DEVICE-RESIDENT operands
    — the protocol's MSM inputs (MAC accumulators, commitment scalar
    batches) live in HBM; this dev harness's host relay moves only
    ~40-90 MB/s (varies by day), which no production TPU host's
    PCIe/DMA path would impose. The host-streamed chunked pipeline is
    exercised and reported separately by examples/bench_msm.py."""
    import random

    import numpy as np

    from porla_tpu.curves import pallas_msm
    from porla_tpu.curves.instances import bn254, secp256k1
    from porla_tpu.curves.weierstrass import JacPoint
    from porla_tpu.fields import limbs as L
    from porla_tpu.golden import ecc

    rng = random.Random(7)
    ops = secp256k1() if curve_name == "secp256k1" else bn254()
    cur = ops.curve
    nbases = 8  # tiled distinct bases keep the golden check O(n) host ints
    bases = [ecc.mul(cur, cur.g, rng.randrange(1, cur.n))
             for _ in range(nbases)]
    sc = [rng.getrandbits(256) % cur.n for _ in range(n)]
    ph = ops.from_affine(np, bases)
    reps = n // nbases
    points = JacPoint(jnp.asarray(np.tile(ph.x, (reps, 1))),
                      jnp.asarray(np.tile(ph.y, (reps, 1))),
                      jnp.asarray(np.tile(ph.z, (reps, 1))))
    sc_limbs = jnp.asarray(L.ints_to_limbs(sc))
    want = ecc.INF
    for g in range(nbases):
        total = sum(sc[g::nbases]) % cur.n
        want = ecc.add(cur, want, ecc.mul(cur, bases[g], total))

    # scalars are reduced mod the group order (the gnark MultiExp
    # contract too, main.go:118-138): bound nbits by the order's bit
    # length — BN254's 254-bit Fr makes c=8's window count tight
    # (pallas_msm._nwin_for) for a measured ~4.6% over c=7@256
    nbits = cur.n.bit_length()

    def run():
        out = pallas_msm.pippenger_msm(ops, points, sc_limbs,
                                       nbits=nbits, affine=True)
        return ops.to_affine(out)[0]

    def check(got):
        # explicit raise (assert is stripped under -O) on EVERY run,
        # warm-up and timed alike
        if got != want:
            raise RuntimeError(f"MSM mismatch vs golden ({curve_name})")

    check(run())  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        got = run()
        times.append(time.perf_counter() - t0)
        check(got)
    t = min(times)
    c = pallas_msm.choose_c(n, nbits)
    return {
        "metric": f"msm_points_per_s_{curve_name}",
        "value": round(n / t, 1),
        "unit": f"pts/s (N=2^20, {nbits}-bit order scalars, Pippenger "
                f"c={c}, device-resident operands, "
                f"{jax.default_backend()})",
        "vs_baseline": round(
            n / t / REFERENCE_CPU_MSM_PTS_PER_S[curve_name], 3),
    }


def main():
    from porla_tpu.ntt import engine, mxu_cg, pallas_stage

    fallback = os.environ.get("PORLA_BENCH_FALLBACK") == "1"
    # workload dimensions are FIXED across backends so numbers stay
    # comparable round to round (n=2^14, C=128 — the calibration point of
    # the baseline denominator, BENCH_NOTES.md)
    n = 1 << 14
    nchunks = 128
    ctx = engine.NttContext(n, "ipa")
    # Toeplitz twiddle stacks as device arrays (passed as args so they are
    # not baked into the compiled program)
    mats_p = [jnp.asarray(m) for m in
              mxu_cg.stage_mats_list(ctx, ctx.mod_p)]
    mats_q = [jnp.asarray(m) for m in
              mxu_cg.stage_mats_list(ctx, ctx.mod_q)]
    nstages = ctx.height - 1

    # fused Pallas stage kernel over the constant-geometry dataflow
    # (porla_tpu/ntt/pallas_stage.py), one executable per stage shape,
    # both CRT lanes
    def encode(up, tp, uq, tq):
        for i in range(nstages - 1):
            up, tp = pallas_stage.cg_step(up, tp, mats_p[i], ctx.mod_p)
            uq, tq = pallas_stage.cg_step(uq, tq, mats_q[i], ctx.mod_q)
        outp = pallas_stage.cg_step(up, tp, mats_p[-1], ctx.mod_p)
        outq = pallas_stage.cg_step(uq, tq, mats_q[-1], ctx.mod_q)
        return outp, outq

    rng = np.random.default_rng(0)
    # random 8-bit digits are a valid canonical-value subset; throughput
    # is data-independent
    ap = rng.integers(0, 1 << 8, (n, nchunks, 32), dtype=np.uint32)
    aq = rng.integers(0, 1 << 8, (n, nchunks, 32), dtype=np.uint32)
    up, tp = (jnp.asarray(z) for z in mxu_cg.cg_prepare(ap))
    uq, tq = (jnp.asarray(z) for z in mxu_cg.cg_prepare(aq))

    def one_round():
        # end with host fetches of both outputs: a true barrier per round
        # (block_until_ready returns early through the device tunnel)
        wp, wq = encode(up, tp, uq, tq)
        _ = np.asarray(wp[0, 0, 0, :1])
        _ = np.asarray(wq[0, 0, 0, :1])

    one_round()  # compile + warm
    reps = 1 if fallback else 3
    t0 = time.perf_counter()
    for _ in range(reps):
        one_round()
    dt = (time.perf_counter() - t0) / reps

    coeffs_per_s = n * nchunks / dt
    out = {
        "metric": "icc_encode_coeffs_per_s",
        "value": round(coeffs_per_s, 1),
        "unit": f"256-bit coeffs/s (n=2^{n.bit_length()-1}, C={nchunks}, "
                f"both CRT lanes, {jax.default_backend()})",
        "vs_baseline": round(coeffs_per_s / REFERENCE_CPU_COEFFS_PER_S, 3),
    }
    if fallback:
        # a CPU-host number is not a per-chip measurement; never report
        # it as a ratio against the per-chip baseline
        out["fallback"] = True
        out["vs_baseline"] = None
        print(json.dumps(out))
        return
    # MSM metrics; BN254 last = the BASELINE.json primary metric
    print(json.dumps(out), flush=True)
    print(json.dumps(bench_msm("secp256k1")), flush=True)
    print(json.dumps(bench_msm("bn254")), flush=True)


if __name__ == "__main__":
    main()
