"""Ablate the fused transformer-body FORWARD kernel at the flagship b0
shape ([E=16, S=64, B=32768]) to locate its VPU time.

The r5 body attribution (probe_body_attrib_r5.py) puts the three fused
transformer bodies at 50.6 of the 70.0 ms body f+b, ~1.8 TFLOP/s effective
— near the VPU's f32 peak — so the next win must come from REMOVING VPU
work, not scheduling.  Variants (all share the production grid/BlockSpecs):

  full      — the production forward kernel
  nosoftmax — attention scores used raw (no max/exp/normalize): isolates
              the softmax transcendentals + reductions
  noattn    — attention replaced by a pass-through of q: isolates the
              whole attention block (outer products + softmax)
  linonly   — body reduced to the 4 MXU linears + adds (no attention, no
              LN): the MXU + memory floor of the fused structure
  copy      — out = x: the pure pipeline/DMA floor

Run: PYTHONPATH=/root/.axon_site:/root/repo python experiments/probe_body_kernel_ablate.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from nasrec_tpu.ops.attention import transformer_init
from nasrec_tpu.ops.kernels import transformer_body_pallas as tbp
from nasrec_tpu.profiling import chained_rate

E, S, B = 16, 64, 32768
NUM_HEADS = 8

p = transformer_init(jax.random.PRNGKey(0), S, S, E, False)
prm = tbp._prm_arrays(p)
rng = np.random.RandomState(0)
x = jnp.asarray((rng.randn(E, S, B) * 0.1).astype(np.float32))


def make_kernel(mode):
    def kernel(x_ref, w_in, b_in, w_out, b_out, g1, h1,
               fc1w, fc1b, fc2w, fc2b, g2, h2, out_ref):
        xx = x_ref[:].astype(jnp.float32)
        if mode == "copy":
            out_ref[:] = xx.astype(out_ref.dtype)
            return
        qkv = tbp._lin(w_in[:], b_in[:], xx)
        if mode == "full":
            o = tbp._attn_fwd(qkv, NUM_HEADS)
        elif mode == "nosoftmax":
            e = E
            hd = e // NUM_HEADS
            q, k, v = qkv[:e], qkv[e:2 * e], qkv[2 * e:]
            outs = []
            for h in range(NUM_HEADS):
                sb = q[h * hd][:, None, :] * k[h * hd][None, :, :]
                for d in range(1, hd):
                    sb = sb + q[h * hd + d][:, None, :] * k[h * hd + d][None, :, :]
                for d in range(hd):
                    outs.append(jnp.sum(sb * v[h * hd + d][None, :, :], axis=1))
            o = jnp.stack(outs, axis=0)
        else:  # noattn / linonly
            o = qkv[:E]
        a = tbp._lin(w_out[:], b_out[:], o)
        if mode == "linonly":
            x4 = a + xx
        else:
            x4, _, _ = tbp._ln_e(a + xx, g1, h1)
        p1 = tbp._lin(fc1w[:], fc1b[:], x4)
        f = tbp._lin(fc2w[:], fc2b[:], jnp.maximum(p1, 0.0))
        if mode == "linonly":
            out = x4 + f
        else:
            out, _, _ = tbp._ln_e(x4 + f, g2, h2)
        out_ref[:] = out.astype(out_ref.dtype)

    return kernel


for mode in ("full", "nosoftmax", "noattn", "linonly", "copy"):
    tb = tbp._pick_tile(B, E, S, bwd=False)
    fn = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((E, S, B), x.dtype),
        grid=(tbp._cdiv(B, tb),),
        in_specs=[tbp._x_spec(E, S, tb)] + tbp._prm_specs(prm),
        out_specs=tbp._x_spec(E, S, tb),
        compiler_params=tbp._params(),
    )
    jf = jax.jit(lambda x, prm: fn(x, *prm).sum())
    jax.device_get(jf(x, prm))

    def run(k):
        o = None
        for _ in range(k):
            o = jf(x, prm)
        jax.device_get(o)

    dt = chained_rate(run, 3, 12)
    print(f"{mode:<10}: {dt*1e3:6.2f} ms", flush=True)
