import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.cl import ewc, lwf, mas
from indic_cl_asr_tpu.utils.pytree import path_mask


def small_params(scale=1.0):
    return {
        "a": {"w": jnp.array([1.0, 2.0]) * scale},
        "b": {"w": jnp.array([[3.0]]) * scale},
    }


class TestEWC:
    def test_penalty_grads_formula(self):
        cfg = ewc.EWCConfig(e_lambda=5.0)
        params = small_params(2.0)
        ckpt = small_params(1.0)
        fish = jax.tree.map(jnp.ones_like, params)
        grads, monitor = ewc.penalty_grads(cfg, fish, params, ckpt)
        # 2 * lambda * F * (p - c) = 2*5*1*(p - p/2)
        np.testing.assert_allclose(
            np.asarray(grads["a"]["w"]), 2 * 5 * 1 * np.array([1.0, 2.0])
        )
        assert monitor > 0

    def test_fisher_accumulate_and_merge(self):
        cfg = ewc.EWCConfig(e_gamma=0.5)
        params = small_params()
        fish = jax.tree.map(jnp.zeros_like, params)
        grads = jax.tree.map(lambda p: 2 * jnp.ones_like(p), params)
        fish = ewc.accumulate_fisher(fish, grads, loss_value=3.0, batch_size=4)
        np.testing.assert_allclose(np.asarray(fish["a"]["w"]), 3.0 * 4.0)
        fish = ewc.finalize_fisher(fish, total_utterances=6)
        np.testing.assert_allclose(np.asarray(fish["a"]["w"]), 2.0)

        merged = ewc.merge_fisher(cfg, None, fish)
        assert merged is fish
        merged2 = ewc.merge_fisher(cfg, fish, fish)
        np.testing.assert_allclose(np.asarray(merged2["a"]["w"]), 0.5 * 2 + 2)

    def test_end_task_zeroes_frozen_and_snapshots(self):
        cfg = ewc.EWCConfig()
        params = small_params()
        fish = jax.tree.map(jnp.ones_like, params)
        mask = path_mask(params, lambda p: p.startswith("a"))
        state = ewc.end_task(cfg, ewc.EWCState(), fish, 2, params, mask)
        assert np.all(np.asarray(state.main_fish["b"]["w"]) == 0.0)
        assert np.all(np.asarray(state.main_fish["a"]["w"]) == 0.5)
        np.testing.assert_allclose(
            np.asarray(state.checkpoint["a"]["w"]), np.asarray(params["a"]["w"])
        )
        # penalty fn active after first task
        fn = ewc.make_penalty_fn(cfg, state)
        pen, grads = fn(small_params(3.0))
        assert float(pen) == 0.0 and grads is not None
        assert ewc.make_penalty_fn(cfg, ewc.EWCState()) is None


class TestMAS:
    def test_penalty_formula(self):
        cfg = mas.MASConfig(mas_lambda=2.0)
        params = small_params(2.0)
        ckpt = small_params(1.0)
        omega = jax.tree.map(jnp.ones_like, params)
        p = mas.penalty(cfg, omega, params, ckpt)
        # sum((p-c)^2) = 1 + 4 + 9 = 14; * lambda 2
        assert float(p) == pytest.approx(28.0)

    def test_importance_accumulation_and_overwrite(self):
        params = small_params()
        omega = jax.tree.map(jnp.zeros_like, params)
        g = jax.tree.map(lambda p: -2.0 * jnp.ones_like(p), params)
        omega = mas.accumulate_importance(omega, g)
        np.testing.assert_allclose(np.asarray(omega["a"]["w"]), 2.0)
        mask = jax.tree.map(lambda _: True, params)
        state = mas.end_task(mas.MASState(), omega, 2, params, mask)
        np.testing.assert_allclose(np.asarray(state.importance["a"]["w"]), 1.0)

    def test_joint_energy_matches_materialized(self, rng):
        B, T, U1, H, V1 = 2, 9, 4, 6, 5
        f = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, U1, H)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((B, H, V1)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((B, V1)), jnp.float32)
        got = float(
            mas.joint_energy_chunked(f, g, w, b, chunk_size=3)
        )
        inp = jax.nn.relu(f[:, :, None, :] + g[:, None, :, :])
        logits = jnp.einsum("btuh,bhv->btuv", inp, w) + b[:, None, None, :]
        want = float(jnp.mean(jnp.sum(logits**2, -1)))
        assert got == pytest.approx(want, rel=1e-5)


class TestLwF:
    def test_ctc_kd_zero_when_identical(self, rng):
        lp = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((3, 5, 7)), jnp.float32), -1
        )
        assert float(lwf.ctc_kd_loss(lp, lp)) == pytest.approx(0.0, abs=1e-5)

    def test_ctc_kd_positive_and_batchmean(self, rng):
        a = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((4, 5, 7)), jnp.float32), -1
        )
        b = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((4, 5, 7)), jnp.float32), -1
        )
        kl = float(lwf.ctc_kd_loss(a, b))
        assert kl > 0
        # doubling batch with identical halves keeps batchmean constant
        a2 = jnp.concatenate([a, a]); b2 = jnp.concatenate([b, b])
        assert float(lwf.ctc_kd_loss(a2, b2)) == pytest.approx(kl, rel=1e-5)

    def test_joint_kd_zero_for_same_model_and_positive_otherwise(self, rng):
        B, T, U1, H, V1 = 2, 8, 3, 6, 5
        f = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, U1, H)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((B, H, V1)), jnp.float32)
        b = jnp.zeros((B, V1))
        same = float(
            lwf.joint_kd_chunked(f, g, f, g, w, b, w, b, chunk_size=4)
        )
        assert same == pytest.approx(0.0, abs=1e-4)
        w2 = w * 0.5
        diff = float(
            lwf.joint_kd_chunked(f, g, f, g, w, b, w2, b, chunk_size=4)
        )
        assert diff > 0

    def test_teacher_gets_no_gradient(self, rng):
        B, T, U1, H, V1 = 2, 6, 3, 4, 5
        f = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, U1, H)), jnp.float32)
        w_s = jnp.asarray(rng.standard_normal((B, H, V1)), jnp.float32)
        w_t = jnp.asarray(rng.standard_normal((B, H, V1)), jnp.float32)
        b = jnp.zeros((B, V1))

        g_s, g_t = jax.grad(
            lambda ws, wt: lwf.joint_kd_chunked(
                f, g, f, g, ws, b, wt, b, chunk_size=3
            ),
            argnums=(0, 1),
        )(w_s, w_t)
        assert float(jnp.abs(g_s).sum()) > 0
        assert float(jnp.abs(g_t).sum()) == 0.0

    def test_end_task_snapshots(self):
        params = small_params()
        st = lwf.end_task(params, {"bn": jnp.ones(2)})
        np.testing.assert_allclose(
            np.asarray(st.teacher_params["a"]["w"]),
            np.asarray(params["a"]["w"]),
        )

    def test_end_task_snapshot_is_a_copy(self):
        # the teacher must survive donation of the TrainState it came
        # from (driver jits with donate_argnums=(0,)) — i.e. it must not
        # alias the source buffers
        params = small_params()
        st = lwf.end_task(params, {"bn": jnp.ones(2)})
        src = params["a"]["w"]
        snap = st.teacher_params["a"]["w"]
        assert snap.unsafe_buffer_pointer() != src.unsafe_buffer_pointer()

    def test_end_task_bf16_teacher(self):
        # SURVEY §7 hard-part 5: bf16 teacher halves LwF's extra HBM;
        # float leaves downcast, non-float leaves untouched
        params = small_params()
        params["a"]["idx"] = jnp.arange(3, dtype=jnp.int32)
        st = lwf.end_task(
            params, {"bn": jnp.ones(2)}, teacher_dtype="bfloat16"
        )
        assert st.teacher_params["a"]["w"].dtype == jnp.bfloat16
        assert st.teacher_params["a"]["idx"].dtype == jnp.int32
        assert st.teacher_batch_stats["bn"].dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(st.teacher_params["a"]["w"], np.float32),
            np.asarray(params["a"]["w"]),
            rtol=8e-3,
        )


class TestLwFFaithfulMode:
    def test_raw_logit_mode_matches_reference_formula(self, rng):
        """faithful_raw_logits=True reproduces the reference's GPU behavior:
        KL computed on RAW joint outputs as if they were log-probs
        (rnnt.py:1649-1662 skips log_softmax on CUDA; SURVEY.md §3.5)."""
        B, T, U1, H, V1 = 2, 6, 3, 4, 5
        f = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, U1, H)), jnp.float32)
        w_s = jnp.asarray(rng.standard_normal((B, H, V1)) * 0.3, jnp.float32)
        w_t = jnp.asarray(rng.standard_normal((B, H, V1)) * 0.3, jnp.float32)
        b = jnp.zeros((B, V1))

        got = float(
            lwf.joint_kd_chunked(
                f, g, f, g, w_s, b, w_t, b, chunk_size=3,
                faithful_raw_logits=True,
            )
        )
        inp = jax.nn.relu(f[:, :, None, :] + g[:, None, :, :])
        s = jnp.einsum("btuh,bhv->btuv", inp, w_s)
        t = jnp.einsum("btuh,bhv->btuv", inp, w_t)
        want = float(jnp.sum(jnp.exp(t) * (t - s)) / B)
        assert got == pytest.approx(want, rel=1e-4)

    def test_fixed_mode_differs_from_faithful(self, rng):
        B, T, U1, H, V1 = 1, 4, 2, 3, 4
        f = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, U1, H)), jnp.float32)
        w_s = jnp.asarray(rng.standard_normal((B, H, V1)), jnp.float32)
        w_t = jnp.asarray(rng.standard_normal((B, H, V1)), jnp.float32)
        b = jnp.zeros((B, V1))
        fixed = float(lwf.joint_kd_chunked(f, g, f, g, w_s, b, w_t, b,
                                           chunk_size=2))
        faithful = float(
            lwf.joint_kd_chunked(f, g, f, g, w_s, b, w_t, b, chunk_size=2,
                                 faithful_raw_logits=True)
        )
        assert fixed != pytest.approx(faithful)
        assert fixed >= -1e-5  # true KL is non-negative


class TestPaddingInvariance:
    """KD / importance surrogates must ignore OUR padding artifacts:
    chunk-pad frames and repeated rows (review r2 findings)."""

    def _tensors(self, rng, B=3, T=10, U1=5, H=8, V1=6):
        f = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, U1, H)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((B, H, V1)) * 0.2, jnp.float32)
        b = jnp.asarray(rng.standard_normal((B, V1)) * 0.1, jnp.float32)
        return f, g, w, b

    def test_joint_kd_chunk_size_invariant(self, rng):
        from indic_cl_asr_tpu.cl.lwf import joint_kd_chunked

        fs, gs, ws, bs = self._tensors(rng)
        ft, gt, wt, bt = self._tensors(np.random.default_rng(9))
        vals = [
            float(joint_kd_chunked(
                fs, gs, ft, gt, ws, bs, wt, bt, chunk_size=c
            ))
            for c in (3, 4, 10, 64)
        ]
        np.testing.assert_allclose(vals, vals[0], rtol=1e-5)

    def test_joint_kd_repeat_row_invariant(self, rng):
        from indic_cl_asr_tpu.cl.lwf import joint_kd_chunked

        fs, gs, ws, bs = self._tensors(rng)
        ft, gt, wt, bt = self._tensors(np.random.default_rng(9))
        rep = lambda x: jnp.concatenate([x, x[-1:]], 0)
        mask = jnp.array([True, True, True, False])
        base = float(joint_kd_chunked(
            fs, gs, ft, gt, ws, bs, wt, bt, chunk_size=4
        ))
        padded = float(joint_kd_chunked(
            rep(fs), rep(gs), rep(ft), rep(gt), rep(ws), rep(bs),
            rep(wt), rep(bt), chunk_size=4, row_mask=mask,
        ))
        np.testing.assert_allclose(padded, base, rtol=1e-5)

    def test_mas_energy_chunk_and_row_invariant(self, rng):
        from indic_cl_asr_tpu.cl.mas import MASConfig, mas_surrogate

        f, g, w, b = self._tensors(rng)
        ctc = jnp.asarray(rng.standard_normal((3, 10, 6)), jnp.float32)
        cfg = MASConfig(mas_ctx=0.3)
        vals = [
            float(mas_surrogate(cfg, f, g, w, b, ctc, chunk_size=c))
            for c in (3, 10, 64)
        ]
        np.testing.assert_allclose(vals, vals[0], rtol=1e-5)
        rep = lambda x: jnp.concatenate([x, x[-1:], x[-1:]], 0)
        mask = jnp.array([True, True, True, False, False])
        padded = float(mas_surrogate(
            cfg, rep(f), rep(g), rep(w), rep(b), rep(ctc),
            chunk_size=4, row_mask=mask,
        ))
        np.testing.assert_allclose(padded, vals[0], rtol=1e-5)


def test_method_state_checkpoint_roundtrip(tmp_path):
    """EWC/MAS/LwF state survives the SequenceCheckpointer (review r2:
    without this a resumed sequence silently degrades to naive)."""
    import jax
    from indic_cl_asr_tpu.cl import ewc as E
    from indic_cl_asr_tpu.utils.checkpoint import SequenceCheckpointer

    params = {"w": jnp.ones((2, 3)), "b": jnp.zeros((3,))}
    fish = {"w": jnp.full((2, 3), 0.5), "b": jnp.full((3,), 0.1)}

    class FakeEWC:
        def __init__(self):
            self.state = E.EWCState()

        def export_state(self):
            if self.state.main_fish is None:
                return None
            return {"main_fish": self.state.main_fish,
                    "checkpoint": self.state.checkpoint}

        def import_state(self, tree):
            if tree is not None:
                self.state = E.EWCState(
                    main_fish=tree["main_fish"],
                    checkpoint=tree["checkpoint"],
                )

    ck = SequenceCheckpointer(str(tmp_path / "seq"))
    m1 = FakeEWC()
    m1.state = E.EWCState(main_fish=fish, checkpoint=params)
    from indic_cl_asr_tpu.train.state import TrainState
    state = TrainState(step=jnp.int32(1), params=params, batch_stats={},
                       opt_state=())
    ck.save_task(0, "hindi", state, {}, method_state=m1.export_state())

    m2 = FakeEWC()
    assert m2.state.main_fish is None
    m2.import_state(ck.load_method_state(0, "hindi"))
    assert m2.state.main_fish is not None
    np.testing.assert_allclose(
        np.asarray(m2.state.main_fish["w"]), 0.5
    )
    np.testing.assert_allclose(
        np.asarray(m2.state.checkpoint["w"]), 1.0
    )
    # stateless save has no method file
    ck.save_task(1, "bengali", state, {}, method_state=None)
    assert ck.load_method_state(1, "bengali") is None


class TestUniformHeadCLPaths:
    """uniform_head fast paths in the MAS surrogate and LwF joint KD must
    match the per-sample-head path exactly on a single-language batch
    (rows replicated from one head bank row — the CL drivers' shape)."""

    def _case(self, rng, B=3, T=7, U1=4, H=6, V1=5):
        f = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, U1, H)), jnp.float32)
        w_row = rng.standard_normal((H, V1)).astype(np.float32)
        b_row = rng.standard_normal((V1,)).astype(np.float32)
        w = jnp.asarray(np.broadcast_to(w_row, (B, H, V1)).copy())
        b = jnp.asarray(np.broadcast_to(b_row, (B, V1)).copy())
        return f, g, w, b

    def test_mas_energy_uniform_matches(self, rng):
        f, g, w, b = self._case(rng)

        def e(ff, uniform):
            return mas.joint_energy_chunked(
                ff, g, w, b, chunk_size=3, uniform_head=uniform
            )

        v_ps, g_ps = jax.value_and_grad(lambda ff: e(ff, False))(f)
        v_un, g_un = jax.value_and_grad(lambda ff: e(ff, True))(f)
        np.testing.assert_allclose(float(v_ps), float(v_un), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(g_ps), np.asarray(g_un), rtol=1e-5, atol=1e-7
        )

    def test_lwf_kd_uniform_matches(self, rng):
        f, g, w, b = self._case(rng)
        f_t = f + 0.1
        w_t = w * 0.9

        def kd(uniform):
            return lwf.joint_kd_chunked(
                f, g, f_t, g, w, b, w_t, b, chunk_size=3,
                uniform_head=uniform,
            )

        v_ps, g_ps = jax.value_and_grad(
            lambda ws: lwf.joint_kd_chunked(
                f, g, f_t, g, ws, b, w_t, b, chunk_size=3
            )
        )(w)
        v_un, g_un = jax.value_and_grad(
            lambda ws: lwf.joint_kd_chunked(
                f, g, f_t, g, ws, b, w_t, b, chunk_size=3,
                uniform_head=True,
            )
        )(w)
        np.testing.assert_allclose(float(v_ps), float(v_un), rtol=1e-6)
        # per-sample grads live on every row; the uniform path's grad
        # lands on row 0 only — total head-bank gradient (sum over the
        # gathered rows, what the outer take scatters) must agree
        np.testing.assert_allclose(
            np.asarray(jnp.sum(g_ps, axis=0)),
            np.asarray(jnp.sum(g_un, axis=0)),
            rtol=1e-5, atol=1e-7,
        )
