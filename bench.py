#!/usr/bin/env python3
"""Flagship benchmark: Fashion-Gen-style 4k-token retrieval inference.

Measures examples/sec/chip for the MMT classification (ITM retrieval)
model at BERT-base geometry with 2D relative attention at seq_len=4096
(196 image patch tokens + long text), bfloat16 + fused Pallas attention,
on the attached TPU chip.

``vs_baseline`` is the speedup over a CPU reference run of the same
model (dense XLA attention, float32 -- a faithful stand-in for the
reference's CPU predict.py path, which is the same dense O(S^2)
BERT-base compute).  The CPU number is measured once in a subprocess and
cached in ``.bench_cpu_baseline.json``.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/sec", "vs_baseline": N}
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

SEQ_LEN = 4096
BATCH = 32  # measured best single-chip throughput at 4k
CPU_BATCH = 8  # batch-matched proxy (B>=8 so vs_baseline isn't inflated
               # by a batch-1 denominator; TPU batch 32 needs the same
               # per-example work)
V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s per chip
CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cpu_baseline.json")
# Independent pure-TF reference-shaped CPU baseline (scripts/
# tf_cpu_baseline.py, ~40 min one-time); removes the self-referential
# denominator from the headline claim.  Measured & committed; bench
# reports vs_baseline_tf when the cache exists rather than re-paying it.
TF_CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".bench_tf_baseline.json")


def model_flops_per_example(lengths, hidden=768, layers=12, intermediate=3072,
                            rel_vocab=49, window=0, num_global=0) -> float:
    """Algorithmic forward FLOPs per example (mean over the batch).

    Counts the encoder's matmuls at each example's REAL length (the
    kernel's pad-skip means padded positions are not useful work):
    qkv+output projections, the two S^2 attention contractions, the
    relative-bias contraction q @ R, and the FFN.  2 FLOPs per MAC.

    With ``window > 0`` the attention contractions count only the
    sliding-window + prefix-global pattern's live (i, j) pairs
    (allowed iff i < num_global or j < num_global or |i-j| <= window —
    the kernel's exact mask), so MFU for the windowed configs reflects
    FLOPs actually performed, not a dense-equivalent inflation.
    """
    import numpy as np

    def attn_pairs(L):
        L = int(L)
        if window <= 0:
            return float(L) * L
        i = np.arange(L, dtype=np.float64)
        lo = np.maximum(i - window, 0)
        hi = np.minimum(i + window, L - 1)
        band = hi - lo + 1
        # globals j < num_global not already inside the band [lo, hi]
        extra_g = np.minimum(np.minimum(num_global, L), lo)
        keys = np.where(i < num_global, float(L), band + extra_g)
        return float(keys.sum())

    total = 0.0
    for L in np.asarray(lengths, dtype=np.float64):
        per_layer = (
            8 * L * hidden * hidden          # q, k, v, o projections
            + 4 * attn_pairs(L) * hidden     # qk^T and pv (pattern-aware)
            + 2 * L * rel_vocab * hidden     # relative-bias q @ R
            + 4 * L * hidden * intermediate  # FFN in + out
        )
        total += layers * per_layer
    return total / max(len(np.asarray(lengths)), 1)


def build(attention_impl: str, compute_dtype: str, batch: int, seed: int = 0,
          seq_len: int = SEQ_LEN, min_len: int = 0, max_len: int = 0,
          quantize: str = "none", window: int = 0):
    import jax

    from __graft_entry__ import _flagship_config, _flagship_inputs
    from mmt_tpu.models import MmtClassificationModel

    cfg = _flagship_config(seq_len, compute_dtype=compute_dtype,
                           attention_impl=attention_impl, quantize=quantize,
                           window=window)
    model = MmtClassificationModel(cfg, num_patch_per_row=14)
    inputs = _flagship_inputs(batch, seq_len, seed=seed,
                              min_len=min_len, max_len=max_len)
    params = jax.jit(lambda r: model.init(r, **inputs))(jax.random.PRNGKey(0))

    @jax.jit
    def forward(params, word_ids, segment_ids, patch_embeddings, lengths):
        out = model.apply(
            params,
            word_ids=word_ids,
            segment_ids=segment_ids,
            patch_embeddings=patch_embeddings,
            lengths=lengths,
            deterministic=True,
        )
        return jax.nn.softmax(out["itm_logits"], axis=-1)[:, 1]

    args = (params, inputs["word_ids"], inputs["segment_ids"],
            inputs["patch_embeddings"], inputs["lengths"])
    return forward, args


def measure(forward, args, batch: int, iters: int, warmup: int = 2) -> float:
    """Blocked per-iteration timing over distinct inputs.

    Each call uses a different word_ids tensor and is individually
    synchronized: the remote-execution relay in this environment
    short-circuits repeated identical dispatches, so async-queue timing
    over one input undercounts wildly.
    """
    import jax.numpy as jnp
    import numpy as np

    params, word_ids, *rest = args
    variants = [
        (params, jnp.roll(word_ids, i, axis=1), *rest) for i in range(max(iters, 1))
    ]
    # Host-transfer each result: on the tunneled TPU runtime in this
    # environment, block_until_ready alone does not await remote
    # completion -- only a device->host transfer is a true sync point.
    np.asarray(forward(*variants[0]))  # compile
    for i in range(warmup):
        np.asarray(forward(*variants[i % len(variants)]))
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(forward(*variants[i]))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def measure_slope(forward, args, batch: int, iters: int = 6) -> float:
    """Device-resident slope timing: K vs 2K forwards chained inside one
    jit (distinct inputs per iteration via jnp.roll), per-forward time =
    the slope between the two chains.

    The per-dispatch ``measure`` path round-trips this environment's TPU
    relay once per call (~50-100 ms), which undercounts short-sequence
    throughput by 12-16% (measured S=256/B=512: dispatch 1261 vs slope
    1509 ex/s).  The slope cancels dispatch/tunnel overhead and measures
    what the chip actually sustains -- the production-serving number.
    All inputs are jit ARGUMENTS (closed-over arrays ship as constants
    through the relay's body-size limit)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    params, word_ids, *rest = args

    def chain(p, w, *r, n):
        def body(i, acc):
            out = forward(p, jnp.roll(w, i, axis=1), *r)
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    f1 = jax.jit(functools.partial(chain, n=iters))
    f2 = jax.jit(functools.partial(chain, n=2 * iters))
    np.asarray(f1(params, word_ids, *rest))
    np.asarray(f2(params, word_ids, *rest))

    def t(f, w):
        t0 = time.perf_counter()
        np.asarray(f(params, w, *rest))
        return time.perf_counter() - t0

    t(f1, word_ids)
    t(f2, word_ids)
    t1 = min(t(f1, jnp.roll(word_ids, 7 * i + 1, 1)) for i in range(3))
    t2 = min(t(f2, jnp.roll(word_ids, 7 * i + 2, 1)) for i in range(3))
    return batch * iters / (t2 - t1)


def cpu_baseline() -> float:
    if os.path.exists(CACHE_FILE):
        with open(CACHE_FILE) as f:
            data = json.load(f)
        if data.get("seq_len") == SEQ_LEN and data.get("batch") == CPU_BATCH:
            return data["examples_per_sec"]
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import bench, json\n"
        "fwd, args = bench.build('xla','float32', bench.CPU_BATCH)\n"
        "eps = bench.measure(fwd, args, bench.CPU_BATCH, iters=1, warmup=0)\n"
        "print('CPU_RESULT ' + json.dumps(eps))\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)), timeout=10800,
    )
    eps = None
    for line in out.stdout.splitlines():
        if line.startswith("CPU_RESULT "):
            eps = float(line.split()[1])
    if eps is None:
        sys.stderr.write(out.stdout + out.stderr)
        raise RuntimeError("CPU baseline measurement failed")
    with open(CACHE_FILE, "w") as f:
        json.dump({"seq_len": SEQ_LEN, "batch": CPU_BATCH,
                   "examples_per_sec": eps,
                   "note": "dense-XLA fp32 CPU reference proxy, batch "
                           f"{CPU_BATCH} (batch-matched denominator)"}, f)
    return eps


def _probe_backend(timeout_s: int = 600) -> bool:
    """Backend init in a SUBPROCESS with a timeout: a wedged TPU relay
    hangs ``jax.devices()`` indefinitely (observed: the local tunnel
    accepts TCP but the remote never replies), which would turn this
    bench into a silent hang.  Returns False -- after printing a
    machine-readable error line -- instead."""
    code = "import jax; print(jax.default_backend())"
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s,
        )
        if out.returncode == 0:
            return True
        err = (out.stderr or "").strip().splitlines()
        detail = err[-1][:200] if err else f"rc={out.returncode}"
    except subprocess.TimeoutExpired:
        detail = f"backend init exceeded {timeout_s}s (TPU relay wedged?)"
    print(json.dumps({
        "metric": "fashion_gen_4k_retrieval_inference",
        "value": 0.0,
        "unit": "examples/sec",
        "error": f"backend unavailable: {detail}",
    }))
    return False


def main():
    if not _probe_backend():
        sys.exit(1)

    import jax

    assert jax.default_backend() in ("tpu", "cpu"), jax.default_backend()
    on_tpu = jax.default_backend() == "tpu"
    impl = "pallas" if on_tpu else "xla"
    forward, args = build(impl, "bfloat16", BATCH)
    eps_dispatch = measure(forward, args, BATCH, iters=10)
    # Headline = device-resident slope rate; the per-dispatch number
    # (includes this environment's relay round trip) rides along.
    eps = measure_slope(forward, args, BATCH, iters=4) if on_tpu \
        else eps_dispatch

    lengths = args[-1]
    flops_ex = model_flops_per_example(lengths)
    tflops = eps * flops_ex / 1e12
    baseline = cpu_baseline()
    row = {
        "metric": "fashion_gen_4k_retrieval_inference",
        "value": round(eps, 3),
        "unit": "examples/sec",
        "vs_baseline": round(eps / baseline, 2),
        "achieved_tflops": round(tflops, 2),
        "mfu_pct_v5e_bf16": round(100.0 * tflops * 1e12 / V5E_BF16_PEAK, 2),
        "dispatch_timed": round(eps_dispatch, 3),
    }
    if os.path.exists(TF_CACHE_FILE):
        with open(TF_CACHE_FILE) as f:
            tf_eps = json.load(f).get("examples_per_sec")
        if tf_eps:
            row["vs_baseline_tf"] = round(eps / tf_eps, 2)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
