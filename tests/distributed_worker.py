"""Two-process distributed contract worker (VERDICT r3 item 3).

Launched as a subprocess by tests/test_att_context_and_dist.py with
``python distributed_worker.py <coordinator_port> <process_id>
<num_processes>``: initializes real multi-process JAX on CPU (1 local
device per process), then exercises the >1-process branches of
parallel/distributed.py and data/pipeline.shard_for_host that are no-ops
at process_count == 1 — the same machinery the reference brings up via
its NCCL process group + torchrun rendezvous
(reference: cl_baseline.py:33-48, sbatch.sh:50-59).

The worker runs ONE data-parallel train step on a tiny hybrid model from
process-local batch rows (jax.make_array_from_process_local_data over a
global 2-device mesh), then prints a JSON line with the loss, an
updated-params checksum and the results of barrier / broadcast_from_main
/ all_hosts_agree; the parent asserts the losses match a single-process
run of the identical global batch.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def make_global_batch():
    """Deterministic global batch, identical on every process (and in the
    parent's single-process reference run)."""
    rng = np.random.default_rng(7)
    B, S, U = 4, 4000, 6
    return {
        "audio": (0.1 * rng.standard_normal((B, S))).astype(np.float32),
        "audio_len": np.full((B,), S, np.int32),
        "tokens": rng.integers(1, 15, (B, U)).astype(np.int32),
        "token_len": np.full((B,), U, np.int32),
        "lang_ids": np.zeros((B,), np.int32),
    }


def build_step():
    from indic_cl_asr_tpu.models.hybrid import HybridRNNTCTC, tiny_config
    from indic_cl_asr_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from indic_cl_asr_tpu.train.step import StepConfig, make_train_step
    from indic_cl_asr_tpu.audio.features import FrontendConfig

    cfg = tiny_config()
    model = HybridRNNTCTC(cfg)
    step_cfg = StepConfig(
        frontend=FrontendConfig(n_mels=cfg.encoder.feat_in),
        use_spec_augment=False,
        rnnt_chunk_size=8,
        fast_dropout_rng=False,
    )
    tx = make_optimizer(lr=1e-3)

    def init_state():
        feats = jnp.zeros((2, cfg.encoder.feat_in, 32), jnp.float32)
        feat_lens = jnp.full((2,), 32, jnp.int32)
        tokens = jnp.zeros((2, 6), jnp.int32)
        lang_ids = jnp.zeros((2,), jnp.int32)
        variables = model.init(
            jax.random.PRNGKey(0), feats, feat_lens, tokens, lang_ids
        )
        return create_train_state(variables, tx)

    raw_step = make_train_step(model, cfg, step_cfg, tx)

    def step_with_key(state, batch):
        # the PRNG key is built INSIDE jit from a literal so every
        # process traces the identical program with no host key transfer
        return raw_step(state, batch, jax.random.PRNGKey(3))

    return init_state, step_with_key


def checksum(params):
    return jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.square(x.astype(jnp.float32))),
        params, jnp.float32(0),
    )


def run_single_process():
    """Reference run: same global batch, default single-device execution."""
    init_state, step_with_key = build_step()
    state = jax.jit(init_state)()
    batch = {k: jnp.asarray(v) for k, v in make_global_batch().items()}
    new_state, aux = jax.jit(step_with_key)(state, batch)
    return float(aux["train_loss"]), float(checksum(new_state.params))


def run_worker(port: int, pid: int, nprocs: int):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from indic_cl_asr_tpu.data.pipeline import shard_for_host
    from indic_cl_asr_tpu.parallel.distributed import (
        all_hosts_agree,
        barrier,
        broadcast_from_main,
        is_main_process,
        setup_distributed,
    )

    idx, count = setup_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert idx == pid and count == nprocs, (idx, count)
    assert is_main_process() == (pid == 0)

    # shard_for_host's >1-process branch: strided, disjoint, covering
    items = list(range(8))
    mine = shard_for_host(items, idx, count)
    assert mine == items[idx::count]

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
    data_sh = NamedSharding(mesh, P("data"))
    rep_sh = NamedSharding(mesh, P())

    init_state, step_with_key = build_step()
    # replicated global state: computed inside jit with out_shardings so
    # no host->global transfer is needed
    state = jax.jit(
        init_state, out_shardings=jax.tree.map(lambda _: rep_sh, jax.eval_shape(init_state))
    )()

    # process-local rows -> one global DP batch
    host_batch = make_global_batch()
    B = host_batch["audio"].shape[0]
    rows_per = B // count
    lo, hi = pid * rows_per, (pid + 1) * rows_per
    batch = {
        k: jax.make_array_from_process_local_data(data_sh, v[lo:hi])
        for k, v in host_batch.items()
    }

    step = jax.jit(
        step_with_key,
        out_shardings=(
            jax.tree.map(
                lambda _: rep_sh,
                jax.eval_shape(step_with_key, state, batch),
            )
        ),
    )
    new_state, aux = step(state, batch)
    loss = float(aux["train_loss"])
    csum = float(
        jax.jit(checksum, out_shardings=rep_sh)(new_state.params)
    )

    barrier("after-step")  # must not hang
    bcast = broadcast_from_main({"v": np.array([idx], np.int32)})
    agree_loss = all_hosts_agree(np.float32(round(loss, 5)))
    agree_idx = all_hosts_agree(np.int32(idx))

    print(json.dumps({
        "pid": pid,
        "count": count,
        "shard": mine,
        "loss": loss,
        "checksum": csum,
        "bcast_v": int(np.asarray(bcast["v"])[0]),
        "agree_loss": bool(agree_loss),
        "agree_idx": bool(agree_idx),
    }), flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "single":
        loss, csum = run_single_process()
        print(json.dumps({"loss": loss, "checksum": csum}), flush=True)
    else:
        run_worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
