import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indic_cl_asr_tpu.models.hybrid import init_model, tiny_config
from indic_cl_asr_tpu.ops.beam_search import (
    ctc_prefix_beam_search,
    rnnt_beam_search,
)
from indic_cl_asr_tpu.ops.decoding import ctc_greedy_decode, rnnt_greedy_decode
from indic_cl_asr_tpu.ops.reference_numpy import ctc_loss_np


class TestCTCBeam:
    def test_peaked_distribution_matches_greedy(self):
        blank = 3
        rows = [0, 0, blank, 1, 1, 2]
        lp = np.full((6, 4), -15.0, np.float32)
        for t, v in enumerate(rows):
            lp[t, v] = 0.0
        beam = ctc_prefix_beam_search(lp, 6, blank, beam_size=4)
        ids, lens = ctc_greedy_decode(
            jnp.asarray(lp)[None], jnp.array([6]), blank
        )
        greedy = np.asarray(ids)[0, : int(lens[0])].tolist()
        assert beam == greedy == [0, 1, 2]

    def test_beam_beats_greedy_on_crafted_case(self):
        """Classic CTC case where the greedy path is suboptimal: the
        single best path is blank-heavy but one label's total prob
        (summed over alignments) dominates."""
        blank = 1
        lp = np.log(np.array([
            [0.4, 0.6],   # greedy picks blank
            [0.4, 0.6],
        ], np.float32))
        beam = ctc_prefix_beam_search(lp, 2, blank, beam_size=4)
        ids, lens = ctc_greedy_decode(
            jnp.asarray(lp)[None], jnp.array([2]), blank
        )
        greedy = np.asarray(ids)[0, : int(lens[0])].tolist()
        assert greedy == []
        # P(label "0") = 0.4*0.6 + 0.6*0.4 + 0.4*0.4 = 0.64 > P("") = 0.36
        assert beam == [0]

    def test_beam_score_is_true_ctc_probability(self, rng):
        """The winning prefix must have lower CTC NLL than greedy's."""
        blank = 4
        lp = np.asarray(
            jax.nn.log_softmax(
                jnp.asarray(rng.standard_normal((8, 5)) * 2), -1
            ),
            np.float32,
        )
        beam = ctc_prefix_beam_search(lp, 8, blank, beam_size=16)
        ids, lens = ctc_greedy_decode(
            jnp.asarray(lp)[None], jnp.array([8]), blank
        )
        greedy = np.asarray(ids)[0, : int(lens[0])].tolist()
        if beam != greedy and len(beam) and len(greedy):
            nll_beam = ctc_loss_np(lp, beam, blank)
            nll_greedy = ctc_loss_np(lp, greedy, blank)
            assert nll_beam <= nll_greedy + 1e-5


@pytest.fixture(scope="module")
def rnnt_setup():
    cfg = tiny_config()
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    def pred_step(last_label, state):
        return model.apply(variables, last_label, state, method="pred_step")

    def joint_step(f_t, g_t, lang_ids):
        return model.apply(variables, f_t, g_t, lang_ids, method="joint_step")

    return cfg, model, variables, pred_step, joint_step


class TestRNNTBeam:
    def test_runs_and_returns_reasonable_output(self, rnnt_setup, rng):
        cfg, model, variables, pred_step, joint_step = rnnt_setup
        T = 6
        f = jnp.asarray(
            rng.standard_normal((1, T, cfg.encoder.d_model)) * 2, jnp.float32
        )
        f_proj = np.asarray(
            model.apply(variables, f, method="joint_project_enc")[0]
        )
        out = rnnt_beam_search(
            f_proj, T, 0, pred_step, joint_step,
            blank=cfg.blank_local, beam_size=3, max_expansions=6,
        )
        assert isinstance(out, list)
        assert all(0 <= v < cfg.blank_local for v in out)

    def test_greedyish_beam1_close_to_greedy(self, rnnt_setup, rng):
        cfg, model, variables, pred_step, joint_step = rnnt_setup
        T = 5
        f = jnp.asarray(
            rng.standard_normal((1, T, cfg.encoder.d_model)) * 3, jnp.float32
        )
        f_proj_j = model.apply(variables, f, method="joint_project_enc")
        ids, lens = rnnt_greedy_decode(
            f_proj_j, jnp.array([T]), jnp.array([0]), pred_step, joint_step,
            None, blank=cfg.blank_local, max_symbols=6, max_out=32,
        )
        greedy = np.asarray(ids)[0, : int(lens[0])].tolist()
        beam = rnnt_beam_search(
            np.asarray(f_proj_j[0]), T, 0, pred_step, joint_step,
            blank=cfg.blank_local, beam_size=1, max_expansions=6,
        )
        # beam=1 follows the greedy path (caps may truncate differently)
        n = min(len(beam), len(greedy))
        assert beam[:n] == greedy[:n]
