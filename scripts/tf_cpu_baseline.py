#!/usr/bin/env python3
"""Reference-shaped TensorFlow CPU baseline for the flagship bench.

VERDICT r4 #5: ``bench.py``'s ``vs_baseline`` denominator is the repo's
own JAX-CPU proxy (dense XLA fp32 of the same model) -- batch-matched
but self-referential.  This script times an INDEPENDENT pure-TF 2.x
implementation of the same compute, shaped like the reference stack
(``/root/reference/src/modeling/models/mmt_encoder.py`` +
etcmodel dense relative attention, the CPU-runnable path of
``src/predict.py``):

* word-embedding lookup + segment embeddings, patch projections written
  into slots [2, 2+P^2) (the reference's quirky embedding order), LN;
* 12 pre-activation layers: dense O(S^2) attention with the per-pair
  relative bias gathered from qr = q @ R by the MMT 2D/1D id map
  (OOV ids -> zero bias, the one-hot semantic), additive -10000 padding
  mask, approximate-gelu FFN;
* CLS pooler (tanh) + 2-class ITM head, softmax[:, 1].

fp32, ``jit_compile=True`` (XLA, like the reference's TPUStrategy
``tf.function``s), batch-matched inputs (same B=8, S=4096,
lengths ~U[S/2, S], same seed as ``bench.build``).  Attention runs
per-head so peak memory stays ~[B, S, S] (the gather/bias/softmax of a
packed [B, H, S, S] would need >20 GB at 4k); per-example FLOPs are
identical either way.

Writes ``.bench_tf_baseline.json`` next to ``bench.py``; ``bench.py``
reports ``vs_baseline_tf`` from it when present.  Takes ~40 min on one
CPU core (one compile run + one timed run at ~0.006 ex/s).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

S = 4096
B = 8  # bench.CPU_BATCH
HIDDEN, LAYERS, HEADS, HEAD_DIM, INTER = 768, 12, 12, 64, 3072
REL_VOCAB, WORD_VOCAB, NUM_PATCHES = 49, 30522, 196
NEG_INF = -10000.0
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_tf_baseline.json")


def main():
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    import tensorflow as tf

    from mmt_tpu.features.relative_position import MmtRelativePositionGenerator

    rng = np.random.default_rng(0)

    def w(*shape):
        return tf.constant(rng.normal(scale=0.02, size=shape), tf.float32)

    emb_word = w(WORD_VOCAB, HIDDEN)
    emb_seg = w(3, HIDDEN)
    w_patch = w(HIDDEN, HIDDEN)
    layer_w = [
        dict(
            q=w(HIDDEN, HEADS, HEAD_DIM), k=w(HIDDEN, HEADS, HEAD_DIM),
            v=w(HIDDEN, HEADS, HEAD_DIM), o=w(HEADS, HEAD_DIM, HIDDEN),
            rel=w(REL_VOCAB, HEADS, HEAD_DIM),
            fi=w(HIDDEN, INTER), fo=w(INTER, HIDDEN),
            ln1g=tf.ones([HIDDEN]), ln1b=tf.zeros([HIDDEN]),
            ln2g=tf.ones([HIDDEN]), ln2b=tf.zeros([HIDDEN]),
        )
        for _ in range(LAYERS)
    ]
    w_pool = w(HIDDEN, HIDDEN)
    w_itm = w(HIDDEN, 2)

    gen = MmtRelativePositionGenerator(14, 1, 12)
    ids = np.asarray(gen.make_relative_att_ids(S))[0]  # [S, S]
    oov = ids >= REL_VOCAB
    ids_b = tf.constant(
        np.broadcast_to(np.where(oov, 0, ids).astype(np.int32), (B, S, S)))
    keep = tf.constant((~oov).astype(np.float32))  # OOV id -> zero bias

    def layer_norm(x, g, b):
        mu = tf.reduce_mean(x, axis=-1, keepdims=True)
        var = tf.reduce_mean(tf.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) * tf.math.rsqrt(var + 1e-12) * g + b

    scale = 1.0 / float(np.sqrt(HEAD_DIM))

    @tf.function(jit_compile=True)
    def forward(word_ids, segment_ids, patch, mask_term):
        x = tf.gather(emb_word, word_ids) + tf.gather(emb_seg, segment_ids)
        patch_emb = tf.einsum("bph,hd->bpd", patch, w_patch)
        x = tf.concat(
            [x[:, :2], x[:, 2:2 + NUM_PATCHES] + patch_emb,
             x[:, 2 + NUM_PATCHES:]], axis=1)
        x = layer_norm(x, tf.ones([HIDDEN]), tf.zeros([HIDDEN]))
        for lw in layer_w:
            h = layer_norm(x, lw["ln1g"], lw["ln1b"])
            q = tf.einsum("bsh,hnd->bsnd", h, lw["q"])
            k = tf.einsum("bsh,hnd->bsnd", h, lw["k"])
            v = tf.einsum("bsh,hnd->bsnd", h, lw["v"])
            ctx = []
            for hh in range(HEADS):
                logits = tf.einsum("bid,bjd->bij", q[:, :, hh], k[:, :, hh])
                qr = tf.einsum("bid,vd->biv", q[:, :, hh], lw["rel"][:, hh])
                bias = tf.gather(qr, ids_b, axis=2, batch_dims=2) * keep
                p = tf.nn.softmax((logits + bias) * scale + mask_term, axis=-1)
                ctx.append(tf.einsum("bij,bjd->bid", p, v[:, :, hh]))
            a = tf.einsum(
                "nbid,ndh->bih", tf.stack(ctx), lw["o"])
            x = x + a
            h = layer_norm(x, lw["ln2g"], lw["ln2b"])
            f = tf.einsum("bsh,hi->bsi", h, lw["fi"])
            f = tf.nn.gelu(f, approximate=True)
            x = x + tf.einsum("bsi,ih->bsh", f, lw["fo"])
        pooled = tf.tanh(tf.einsum("bh,hd->bd", x[:, 0], w_pool))
        return tf.nn.softmax(tf.einsum("bd,dc->bc", pooled, w_itm))[:, 1]

    # Batch-matched inputs: same distributions/seed as bench.build's
    # _flagship_inputs (lengths ~U[S/2, S]).
    irng = np.random.default_rng(0)
    word_ids = tf.constant(irng.integers(0, 30000, (B, S)), tf.int32)
    segment_ids = tf.constant(
        np.broadcast_to(
            np.where(np.arange(S) < NUM_PATCHES + 2, 1, 2), (B, S)
        ).astype(np.int32))
    patch = tf.constant(
        irng.normal(size=(B, NUM_PATCHES, HIDDEN)), tf.float32)
    lengths = irng.integers(S // 2, S + 1, (B,))
    mask = (np.arange(S)[None, :] < lengths[:, None])
    # Reference segmented mask semantics: real attends real, pad attends
    # pad; additive -10000 on cross pairs.
    mask_term = tf.constant(
        np.where(mask[:, None, :] == mask[:, :, None], 0.0, NEG_INF
                 ).astype(np.float32))

    t0 = time.perf_counter()
    np.asarray(forward(word_ids, segment_ids, patch, mask_term))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(forward(word_ids, segment_ids, patch, mask_term))
    dt = time.perf_counter() - t0
    eps = B / dt
    with open(CACHE, "w") as f:
        json.dump({
            "seq_len": S, "batch": B, "examples_per_sec": eps,
            "compile_s": round(compile_s, 1),
            "note": "independent pure-TF 2.x reference-shaped dense fp32 "
                    "CPU baseline (per-head attention, XLA jit_compile), "
                    "batch-matched to bench.CPU_BATCH",
        }, f)
    print(json.dumps({"tf_cpu_examples_per_sec": eps,
                      "compile_s": round(compile_s, 1)}))


if __name__ == "__main__":
    main()
