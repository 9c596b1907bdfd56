"""Two-way migration demo: reference torch checkpoint <-> this framework.

    python examples/migrate_from_reference.py          # CPU ok, ~1 min

1. Builds a (random-weight) checkpoint in the reference's NlpClassifier
   state_dict layout — stand-in for a production .pt file.
2. Imports it (`reference_import`), verifies embedding parity against the
   torch module to <1e-4.
3. Serves it the TPU-native way: batched embedding + exact k-NN similar job.
4. Exports it back (`reference_export`) and strict-loads it into a fresh
   torch module — the round trip a production hand-off needs.

The same flow works from the command line:
    cli import-checkpoint --kind nlp --state_dict prod.pt --out ckpt/
    cli similar nlp --checkpoint ckpt/ ...
    cli export-checkpoint --kind nlp --checkpoint ckpt/ --out back.pt
"""

import os

import numpy as np


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch
    import torch.nn as nn_t
    from transformers import BertConfig as HFBertConfig, BertModel

    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.models.reference_export import (
        nlp_classifier_to_reference)
    from multimodalsimilar_tpu.models.reference_import import (
        nlp_classifier_from_reference)
    from multimodalsimilar_tpu.utils.dtypes import DTypePolicy

    cfg = BertConfig.tiny()
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu", attn_implementation="eager")

    # --- 1. a "production" reference checkpoint (random weights here);
    # layout matches nlp_classifier.py exactly: shared ptm under two names
    # plus TransformerEmb's dead emb_layer/bn_layer weights
    class RefTransformerEmb(nn_t.Module):
        def __init__(self, ptm):
            super().__init__()
            self.ptm = ptm
            self.emb_layer = nn_t.Linear(cfg.hidden_size, 128)
            self.bn_layer = nn_t.BatchNorm1d(cfg.hidden_size)

    class RefNlpClassifier(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.ptm = BertModel(hf_cfg)
            self.emb_layer = RefTransformerEmb(self.ptm)
            self.classifier = nn_t.Module()
            self.classifier.weight = nn_t.Parameter(
                torch.randn(6, cfg.hidden_size))

    torch.manual_seed(0)
    ref = RefNlpClassifier().eval()
    print("reference checkpoint:", len(ref.state_dict()), "tensors")

    # --- 2. import + embedding parity
    params = nlp_classifier_from_reference(ref.state_dict(), cfg)
    model = NlpTextClassifier(cfg, num_labels=6,
                              policy=DTypePolicy.full_precision())
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(4, 12)).astype(np.int32)
    mask = np.ones((4, 12), np.int32)
    with torch.no_grad():
        want = ref.ptm(torch.from_numpy(ids).long(),
                       attention_mask=torch.from_numpy(mask).long()
                       ).pooler_output.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                 jnp.asarray(mask),
                                 method=model.predict_emb))
    err = float(np.abs(got - want).max())
    print(f"import parity: max |delta| = {err:.2e}")
    assert err < 1e-4

    # --- 3. serve TPU-native: batched embed + exact k-NN
    from multimodalsimilar_tpu.pipelines.similar import nlp_similar_job
    from multimodalsimilar_tpu.pipelines.sinks import InMemoryKVSink
    import pandas as pd

    run = jax.jit(lambda v, i, m: model.apply(v, i, m,
                                              method=model.predict_emb))
    df = pd.DataFrame({"spu_sn": [f"s{i}" for i in range(64)],
                       "spu_name": [f"t{i}" for i in range(64)]})
    embs = np.asarray(run({"params": params},
                          jnp.asarray(rng.integers(
                              0, cfg.vocab_size, size=(64, 12))
                              .astype(np.int32)),
                          jnp.ones((64, 12), jnp.int32)))
    kv = InMemoryKVSink()
    written = nlp_similar_job(df, lambda texts: embs[:len(texts)], kv,
                              k=5, score_th=0.0)
    print(f"similar job wrote {written} keys")

    # --- 4. export back; the reference module strict-loads it
    sd_back = nlp_classifier_to_reference(params, cfg)
    fresh = RefNlpClassifier().eval()
    missing, unexpected = fresh.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd_back.items()}, strict=False)
    assert not unexpected
    with torch.no_grad():
        back = fresh.ptm(torch.from_numpy(ids).long(),
                         attention_mask=torch.from_numpy(mask).long()
                         ).pooler_output.numpy()
    print(f"export round-trip: max |delta| = "
          f"{float(np.abs(back - want).max()):.2e}")
    print("migration demo OK")


if __name__ == "__main__":
    main()
