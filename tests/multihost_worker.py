"""Worker for tests/test_multihost.py — one process of a 2-process run.

Validates the TRUE multi-host path (SURVEY.md §2.6: DP over DCN via
jax.distributed): two OS processes, 4 virtual CPU devices each, one global
8-device mesh over the gloo collective backend, running the SAME Trainer
train step used everywhere else. Each process feeds its host-local batch
shard; losses must agree across processes (printed for the parent to check).

Usage: python multihost_worker.py <process_id> <coordinator addr:port>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(pid: int, coordinator: str):
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import (
        NlpMultilabelClassifier)
    from multimodalsimilar_tpu.parallel.mesh import (
        create_mesh, init_distributed)
    from multimodalsimilar_tpu.train.optim import (
        dual_group_adamw, linear_schedule_with_warmup)
    from multimodalsimilar_tpu.train.tasks import multilabel_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    init_distributed(coordinator, num_processes=2, process_id=pid)
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4
    mesh = create_mesh()                      # global (8, 1) mesh

    cfg = BertConfig.tiny()
    model = NlpMultilabelClassifier(cfg, lv1_labels=8, lv2_labels=16,
                                    tag_labels=64,
                                    policy=DTypePolicy.full_precision())
    tx = dual_group_adamw(linear_schedule_with_warmup(5e-5, 0, 100),
                          linear_schedule_with_warmup(1e-2, 10, 100))
    trainer = Trainer(multilabel_arcface_task(model), tx, mesh,
                      TrainerConfig(log_every=10**9))

    # deterministic GLOBAL batch; this process contributes its local rows
    B, S = 16, 12
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(1, cfg.vocab_size,
                                  size=(B, S)).astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "lv1_label": rng.integers(0, 8, size=(B,)).astype(np.int32),
        "lv2_label": rng.integers(0, 16, size=(B,)).astype(np.int32),
        "tag_label": rng.integers(0, 64, size=(B,)).astype(np.int32),
    }
    half = B // 2
    local = {k: v[pid * half:(pid + 1) * half] for k, v in batch.items()}
    # the production transfer point itself: shard_batch assembles each
    # process's host-local slice into one global batch-sharded array
    # (review fix — a bare device_put would crash on per-host loaders)
    from multimodalsimilar_tpu.parallel.mesh import shard_batch
    device_batch = shard_batch(mesh, local)

    state = trainer.init_state_from_device_batch(device_batch)
    losses = []
    for _ in range(2):
        state, metrics = trainer._train_step(state, device_batch,
                                             jax.random.key(1))
        # the loss is replicated over the global mesh; read this process's
        # local copy, then gather the HOST values across processes and
        # require exact agreement
        local = float(np.asarray(metrics["loss"].addressable_data(0)))
        vals = np.asarray(multihost_utils.process_allgather(
            np.float32(local)))
        assert vals[0] == vals[1], vals
        losses.append(float(vals[0]))
    step = int(np.asarray(state.step.addressable_data(0)))

    # -- retrieval over the same 2-process mesh: the warehouse kNN's
    # shard-local scan + candidate all-gather rides the SAME cross-process
    # transport as the gradient collectives (SURVEY.md §2.6). Each process
    # contributes its host-local corpus shard; the replicated result must
    # agree across processes AND match numpy brute force exactly
    # (FAISS tie-break included).
    from multimodalsimilar_tpu.retrieval.knn import sharded_knn_search
    n, d, k = 64, 8, 5
    rng2 = np.random.default_rng(7)
    corpus = rng2.integers(-2, 3, size=(n, d)).astype(np.float32)  # ties
    queries = rng2.integers(-2, 3, size=(6, d)).astype(np.float32)
    halfn = n // 2
    corpus_g = shard_batch(mesh, corpus[pid * halfn:(pid + 1) * halfn])
    queries_g = jax.make_array_from_callback(
        queries.shape, jax.sharding.NamedSharding(mesh, P()),
        lambda idx: queries[idx])
    vals, idx = sharded_knn_search(mesh, corpus_g, queries_g, k,
                                   metric="ip")
    got_v = np.asarray(vals.addressable_data(0))
    got_i = np.asarray(idx.addressable_data(0))
    s = queries @ corpus.T
    order = np.lexsort((np.broadcast_to(np.arange(n), s.shape), -s),
                       axis=-1)[:, :k]
    assert np.array_equal(got_i, order), (got_i, order)
    assert np.allclose(got_v, np.take_along_axis(s, order, -1),
                       rtol=1e-5, atol=1e-5)
    knn_digest = int(np.asarray(multihost_utils.process_allgather(
        np.float64(got_v.sum() + got_i.sum()))).sum())

    # -- tensor + sequence parallelism on the same 2-process run: the
    # realistic DCN placement (model axis INTRA-process, data axis across
    # processes — multi-slice pods keep TP inside a slice). The TP
    # boundary collectives, SP gathers and the cross-process grad
    # all-reduce all execute in one program under jax.distributed; the
    # first-step loss must agree across processes AND match the DP run's
    # (sharding is a layout choice, not a math change).
    mesh_tp = create_mesh(data=2, model=4)
    sp_model = NlpMultilabelClassifier(
        BertConfig.tiny(sequence_parallel=True), lv1_labels=8,
        lv2_labels=16, tag_labels=64, policy=DTypePolicy.full_precision())
    tp_trainer = Trainer(
        multilabel_arcface_task(sp_model), tx, mesh_tp,
        TrainerConfig(log_every=10**9, model_parallel_heads=True,
                      tensor_parallel=True, sequence_parallel=True))
    local_rows = {k: v[pid * half:(pid + 1) * half]
                  for k, v in batch.items()}
    tp_batch = shard_batch(mesh_tp, local_rows)
    tp_state = tp_trainer.init_state_from_device_batch(tp_batch)
    tp_state, tp_metrics = tp_trainer._train_step(tp_state, tp_batch,
                                                  jax.random.key(1))
    tp_local = float(np.asarray(tp_metrics["loss"].addressable_data(0)))
    tp_vals = np.asarray(multihost_utils.process_allgather(
        np.float32(tp_local)))
    assert tp_vals[0] == tp_vals[1], tp_vals
    assert abs(tp_vals[0] - losses[0]) < 1e-3 * max(abs(losses[0]), 1), \
        (tp_vals[0], losses[0])

    # -- pipeline parallelism on the same 2-process run: stages
    # INTRA-process (the model axis pairs adjacent local devices), so the
    # GPipe ppermutes stay in-process while the DP gradient all-reduce
    # crosses processes — all in one program under jax.distributed. The
    # first-step loss must agree across processes AND match a plain DP
    # step from the SAME bridged weights (dropout off: the two paths fold
    # dropout keys differently, so parity is defined dropout-free).
    from multimodalsimilar_tpu.models.bert import stack_layer_params
    from multimodalsimilar_tpu.train.trainer import TrainState
    import jax.numpy as jnp

    cfg_nd = BertConfig.tiny(hidden_dropout=0.0, attention_dropout=0.0)
    dp_model_nd = NlpMultilabelClassifier(
        cfg_nd, lv1_labels=8, lv2_labels=16, tag_labels=64,
        policy=DTypePolicy.full_precision())
    dp_tr_nd = Trainer(multilabel_arcface_task(dp_model_nd), tx, mesh,
                       TrainerConfig(log_every=10**9))
    dp_state_nd = dp_tr_nd.init_state_from_device_batch(device_batch)
    host_params = jax.tree_util.tree_map(
        lambda x: np.asarray(x.addressable_data(0)), dp_state_nd.params)
    _, dp_nd_metrics = dp_tr_nd._train_step(dp_state_nd, device_batch,
                                            jax.random.key(1))
    dp_nd_loss = float(np.asarray(
        dp_nd_metrics["loss"].addressable_data(0)))

    mesh_pp = create_mesh(data=4, model=2)
    cfg_pp = BertConfig.tiny(hidden_dropout=0.0, attention_dropout=0.0,
                             pipeline_parallel=True, pp_microbatches=2)
    pp_model = NlpMultilabelClassifier(
        cfg_pp, lv1_labels=8, lv2_labels=16, tag_labels=64,
        policy=DTypePolicy.full_precision())
    pp_trainer = Trainer(
        multilabel_arcface_task(pp_model), tx, mesh_pp,
        TrainerConfig(log_every=10**9, model_parallel_heads=True,
                      pipeline_parallel=True))
    params_pp = dict(host_params)
    params_pp["tower"] = dict(host_params["tower"])
    params_pp["tower"]["encoder"] = stack_layer_params(
        host_params["tower"]["encoder"], cfg_pp.num_layers)
    pp_state = pp_trainer._place_state(TrainState(
        step=jnp.zeros((), jnp.int32), params=params_pp, batch_stats={},
        opt_state=pp_trainer.tx.init(params_pp),
        margin=jnp.asarray(0.4, jnp.float32)))
    pp_batch = shard_batch(mesh_pp, {k: v[pid * half:(pid + 1) * half]
                                     for k, v in batch.items()})
    pp_state, pp_metrics = pp_trainer._train_step(pp_state, pp_batch,
                                                  jax.random.key(1))
    pp_local = float(np.asarray(pp_metrics["loss"].addressable_data(0)))
    pp_vals = np.asarray(multihost_utils.process_allgather(
        np.float32(pp_local)))
    assert pp_vals[0] == pp_vals[1], pp_vals
    assert abs(pp_vals[0] - dp_nd_loss) < 1e-3 * max(abs(dp_nd_loss), 1), \
        (pp_vals[0], dp_nd_loss)

    print(f"RESULT pid={pid} step={step} "
          f"losses={losses[0]:.6f},{losses[1]:.6f} knn={knn_digest} "
          f"tp_sp_loss={tp_vals[0]:.6f} pp_loss={pp_vals[0]:.6f}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
