"""Numeric audit of the index-free fused inference encoder on the real TPU.

Runs the standard flax SEDNet forward and ops.fused_edgeconv's fused path
on the SAME parameters at production scale (B x 10k, k=64, mode 5) and
reports the drift between them:

  * normalized-embedding angular difference (the clustering input),
  * type-head argmax agreement,
  * edge-head argmax agreement.

On CPU the two paths agree to ~5e-5 (tests/test_fused_edgeconv.py); on TPU
the default-precision (bf16) matmuls make deep-layer kNN neighbour sets
flip for near-ties, so drift is expected but must stay far below the
mean-shift bandwidth (>= 0.003, typically 0.05-0.15 on the unit sphere).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/audit_fused_encoder.py
Prints one JSON line and asserts the bounds.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sednet_tpu.models.sednet import SEDNet, apply_fused

    b, n, k = 2, 10000, 64
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, n, 6)).astype(np.float32)
    x[..., 3:] /= np.linalg.norm(x[..., 3:], axis=-1, keepdims=True)
    x = jnp.asarray(x)
    model = SEDNet(mode=5, k=k)
    vars_ = model.init(jax.random.PRNGKey(0), x[:1, :256])

    o1 = model.apply(vars_, x)
    o2 = apply_fused(model, vars_, x)
    e1, e2 = np.asarray(o1.embedding), np.asarray(o2.embedding)
    n1 = e1 / np.linalg.norm(e1, axis=-1, keepdims=True)
    n2 = e2 / np.linalg.norm(e2, axis=-1, keepdims=True)
    ang = np.arccos(np.clip((n1 * n2).sum(-1), -1, 1))
    t_agree = float(np.mean(np.asarray(o1.type_log_prob).argmax(-1)
                            == np.asarray(o2.type_log_prob).argmax(-1)))
    e_agree = float(np.mean(np.asarray(o1.edge_logits).argmax(-1)
                            == np.asarray(o2.edge_logits).argmax(-1)))

    rec = {
        "ang_mean_rad": round(float(ang.mean()), 6),
        "ang_p99_rad": round(float(np.percentile(ang, 99)), 6),
        "ang_max_rad": round(float(ang.max()), 6),
        "type_argmax_agreement": t_agree,
        "edge_argmax_agreement": e_agree,
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))
    # bounds: drift must stay an order of magnitude under the minimum
    # mean-shift bandwidth regime; heads must be essentially unchanged
    assert rec["ang_max_rad"] < 0.05, rec
    assert t_agree > 0.999, rec
    assert e_agree > 0.999, rec


if __name__ == "__main__":
    main()
