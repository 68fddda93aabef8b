"""On-device validation of the flash rel-pos MHSA kernel (ops/flash_mhsa.py).

The pytest suite proves kernel==oracle in interpret mode on CPU; this
script proves the REAL Mosaic-compiled kernel on the TPU:
  1. value parity vs the XLA oracle at flagship attention shapes
     (B16 T204 H8 D64), bf16 inputs, deterministic;
  2. gradient parity (all six inputs) at reduced batch;
  3. the dropout fwd/bwd mask-consistency contract via the linear-in-v
     identity <G, f(v+E) - f(v)> == <df/dv, E> (exact when backward
     regenerates the forward's PRNG mask).

Run alone — NEVER alongside another TPU process. Exit code 0 = all pass.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> int:
    from indic_cl_asr_tpu.ops.flash_mhsa import (
        flash_relpos_mhsa,
        relpos_attention_reference,
    )

    assert jax.default_backend() == "tpu", "run on the TPU"
    # warm the tunneled worker with a 1-op program first (ROADMAP notes)
    jax.block_until_ready(
        jax.jit(lambda a: a @ a)(jnp.ones((128, 128), jnp.bfloat16))
    )

    B, T, H, D = 16, 204, 8, 64
    rng = np.random.default_rng(0)

    def mk(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.standard_normal(shape), dtype)

    q4, k4, v4 = mk((B, T, H, D)), mk((B, T, H, D)), mk((B, T, H, D))
    p4 = mk((2 * T - 1, H, D))
    u = mk((H, D), jnp.float32) * 0.1
    vb = mk((H, D), jnp.float32) * 0.1
    lens = jnp.asarray(
        rng.integers(T // 2, T + 1, (B,)).tolist(), jnp.int32
    )

    flat = lambda x: x.reshape(x.shape[0], x.shape[1], -1)  # noqa: E731

    # 1. value parity, bf16 (tolerance: bf16 has ~3 decimal digits)
    out = jax.jit(
        lambda *a: flash_relpos_mhsa(*a, n_heads=H, interpret=False)
    )(flat(q4), flat(k4), flat(v4), p4.reshape(-1, H * D), u, vb, lens)
    ref = jax.jit(relpos_attention_reference)(q4, k4, v4, p4, u, vb, lens)
    err = float(
        jnp.max(jnp.abs(out.astype(jnp.float32)
                        - flat(ref).astype(jnp.float32)))
    )
    print(f"value max|err| (bf16): {err:.5f}")
    assert err < 0.05, "bf16 value parity failed"

    # 2. gradient parity, f32, B=4
    Bs = 4
    qf, kf, vf = (x[:Bs].astype(jnp.float32) for x in (q4, k4, v4))
    pf = p4.astype(jnp.float32)
    cot = mk((Bs, T, H, D), jnp.float32)

    def loss_flash(q, k, v, p, u_, vb_):
        o = flash_relpos_mhsa(
            flat(q), flat(k), flat(v), p.reshape(-1, H * D), u_, vb_,
            lens[:Bs], n_heads=H, interpret=False,
        )
        return jnp.sum(o * flat(cot))

    def loss_ref(q, k, v, p, u_, vb_):
        o = relpos_attention_reference(q, k, v, p, u_, vb_, lens[:Bs])
        return jnp.sum(o * cot)

    gf = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4, 5)))(
        qf, kf, vf, pf, u, vb
    )
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5)))(
        qf, kf, vf, pf, u, vb
    )
    for name, a, b in zip("qkvpuv", gf, gr):
        e = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        print(f"grad d{name}: max|err| {e:.6f} (rel {e / s:.2e})")
        assert e / s < 2e-3, f"grad d{name} parity failed"

    # 3. dropout fwd/bwd PRNG-mask consistency (linear-in-v identity)
    seed = jnp.asarray([13], jnp.int32)

    def f_v(v):
        return flash_relpos_mhsa(
            flat(qf), flat(kf), v, pf.reshape(-1, H * D), u, vb,
            lens[:Bs], n_heads=H, dropout_rate=0.3, dropout_seed=seed,
            interpret=False,
        )

    E = mk((Bs, T, H * D), jnp.float32)
    G = mk((Bs, T, H * D), jnp.float32)
    vfl = flat(vf)
    o1 = jax.jit(f_v)(vfl)
    o1b = jax.jit(f_v)(vfl)
    assert jnp.array_equal(o1, o1b), "dropout not deterministic per seed"
    dv = jax.jit(jax.grad(lambda vv: jnp.sum(f_v(vv) * G)))(vfl)
    lhs = float(jnp.sum(G * (jax.jit(f_v)(vfl + E) - o1)))
    rhs = float(jnp.sum(dv * E))
    print(f"dropout linearity: lhs {lhs:.4f} rhs {rhs:.4f}")
    assert abs(lhs - rhs) / (abs(rhs) + 1e-9) < 1e-3, (
        "backward regenerated a DIFFERENT dropout mask than forward"
    )

    # 4. hardware strided-rotate rel-shift vs the barrel shifter, REAL
    # kernel both times (FLASH_HW_ROLL escape hatch): the rotate is pure
    # data movement and the flip-conjugated backward preserves each output
    # element's per-row contraction order, so values AND dqu/dk/dv must be
    # bit-identical; dp/dqv accumulate over a permuted row order (tiny
    # f32 reassociation tolerance).
    import indic_cl_asr_tpu.ops.flash_mhsa as fm

    def grads_with(hw):
        fm._HW_ROLL = hw
        return jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4, 5)))(
            qf, kf, vf, pf, u, vb
        )

    try:
        g_hw = grads_with(True)
        g_ba = grads_with(False)
    finally:
        fm._HW_ROLL = True
    for name, a, b in zip("qkvpuv", g_hw, g_ba):
        e = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(b))) + 1e-9
        print(f"hw-vs-barrel d{name}: max|diff| {e:.2e}")
        assert e / s < 1e-6, f"hw rotate != barrel for d{name}"

    # 5. the same A/B at bf16 — the FLAGSHIP program class. (Round-3d
    # regression: HIGHEST-precision flips compiled fine for the f32
    # grads above but Mosaic rejects an fp32 contract on bf16 operands,
    # so a validator without this section passed while the train step
    # failed to compile.)
    def loss_bf16(q, k, v):
        o = flash_relpos_mhsa(
            flat(q), flat(k), flat(v), p4.reshape(-1, H * D), u, vb,
            lens[:Bs], n_heads=H, interpret=False,
        )
        return jnp.sum(o.astype(jnp.float32) * flat(cot))

    def grads_bf16(hw):
        fm._HW_ROLL = hw
        return jax.jit(jax.grad(loss_bf16, argnums=(0, 1, 2)))(
            q4[:Bs], k4[:Bs], v4[:Bs]
        )

    try:
        gb_hw = grads_bf16(True)
        gb_ba = grads_bf16(False)
    finally:
        fm._HW_ROLL = True
    for name, a, b in zip("qkv", gb_hw, gb_ba):
        e = float(jnp.max(jnp.abs(
            a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"hw-vs-barrel bf16 d{name}: max|diff| {e:.2e}")
        assert e == 0.0, f"bf16 hw rotate != barrel for d{name}"

    print("flash_mhsa TPU validation OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
