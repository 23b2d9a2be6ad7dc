"""Pool + stage-conv probes (continuation of exp_stem_breakdown after the
49-fold OOM): maxpool select_and_scatter cost, manual equality backward,
stage0 k3 conv cost at level 1."""
import os, sys, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))
import jax, jax.numpy as jnp, numpy as np
from scripts.bench_protocol import timed_diff
from docs.experiments.round2.exp_stem_breakdown import (
    B, D, H, W, make_inputs, conv3d, pool_fwd_chain, pool_fwd_bwd_chain,
    manual_pool_chain)

def stage_conv_chain(n):
    """k3 64->64 conv at level-1 dims (44,44,40), fwd+dW+dX (in-model the
    stage convs need dx too)."""
    def run(h, w):
        def loss(wi, hi):
            pad = 1
            y = jax.lax.conv_general_dilated(
                hi, wi, (1, 1, 1), [(pad, pad)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
        def body(c, _):
            wi, hi = c
            gw, gh = jax.grad(loss, argnums=(0, 1))(wi, hi)
            return (wi - gw.astype(wi.dtype) * 1e-9,
                    hi - gh.astype(hi.dtype) * 1e-9), None
        (wout, _), _ = jax.lax.scan(body, (h, w), None, length=n)
        return wout
    return run

def main():
    x, occ, w = make_inputs()
    h = jax.block_until_ready(conv3d(x, w))
    r = {}
    r["pool_fwd"] = timed_diff(pool_fwd_chain, (h, occ))
    print(f"maxpool fwd                : {r['pool_fwd']:8.2f} ms")
    r["pool_fwd_bwd"] = timed_diff(pool_fwd_bwd_chain, (h, occ))
    print(f"maxpool fwd+bwd (sel&scat) : {r['pool_fwd_bwd']:8.2f} ms")
    r["pool_manual"] = timed_diff(manual_pool_chain, (h, occ))
    print(f"maxpool fwd+manual bwd     : {r['pool_manual']:8.2f} ms")
    rng = np.random.default_rng(1)
    h1 = jnp.asarray(rng.normal(size=(B, 44, 44, 40, 64)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    r["stage_conv"] = timed_diff(stage_conv_chain, (h1, w1))
    print(f"stage k3 64ch L1 fwd+grads : {r['stage_conv']:8.2f} ms")
    print(json.dumps(r))

if __name__ == "__main__":
    main()
