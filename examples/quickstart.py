"""End-to-end quickstart on synthetic data: train -> embed -> similar.

Runs on CPU in ~2 minutes (or on the TPU if JAX_PLATFORMS is left alone):

    python examples/quickstart.py

Covers the reference's core loop at toy scale: ArcFace text-classifier
training (nlp_classifier_train capability), batched embedding export
(goodssku_emb_bert_di capability), and the k-NN similar job with threshold
filtering + KV writes (nlp_infer capability).
"""

import os
import tempfile

import numpy as np
import pandas as pd


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # honor the documented `JAX_PLATFORMS=cpu python examples/...`
        # invocation even on images whose sitecustomize pre-reads the env
        # var before user code runs (the config update wins over both)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from multimodalsimilar_tpu.data.datasets import TextClassificationSource
    from multimodalsimilar_tpu.data.tokenizer import TextTokenizer
    from multimodalsimilar_tpu.models.bert import BertConfig
    from multimodalsimilar_tpu.models.classifiers import NlpTextClassifier
    from multimodalsimilar_tpu.parallel.mesh import create_mesh
    from multimodalsimilar_tpu.pipelines.embedders import TextEmbedder
    from multimodalsimilar_tpu.pipelines.similar import nlp_similar_job
    from multimodalsimilar_tpu.pipelines.sinks import InMemoryKVSink
    from multimodalsimilar_tpu.train.optim import (
        dual_group_adamw, linear_schedule_with_warmup)
    from multimodalsimilar_tpu.train.tasks import text_arcface_task
    from multimodalsimilar_tpu.train.trainer import Trainer, TrainerConfig

    # --- synthetic product-title data: 4 categories with marker words ----
    rng = np.random.default_rng(0)
    cats = ["水果 苹果 香蕉", "乳品 牛奶 酸奶", "饮料 可乐 汽水",
            "零食 薯片 饼干"]
    rows = []
    for i in range(512):
        k = i % 4
        words = cats[k].split()
        title = " ".join(rng.choice(words, 2)) + f" 商品{i}"
        rows.append({"spu_name": title, "labels": k,
                     "spu_sn": f"sku{i}"})
    df = pd.DataFrame(rows)
    tokenizer = TextTokenizer.from_corpus(df["spu_name"])

    # --- train (dual-LR ArcFace recipe) ---------------------------------
    model = NlpTextClassifier(BertConfig.tiny(), num_labels=4)
    mesh = create_mesh()
    steps = len(df) // 64 * 3
    tx = dual_group_adamw(linear_schedule_with_warmup(1e-4, 0, steps),
                          linear_schedule_with_warmup(1e-2, 10, steps))
    out_dir = tempfile.mkdtemp(prefix="quickstart_")
    trainer = Trainer(text_arcface_task(model), tx, mesh, TrainerConfig(
        eval_every=10**9, save_every=8, log_every=8,
        checkpoint_dir=os.path.join(out_dir, "ckpt")))
    src = TextClassificationSource(df, tokenizer, max_length=16)
    state = trainer.fit(src, num_epochs=3, batch_size=64)
    final = trainer.evaluate(state, src.batches(64, shuffle=False))
    print(f"train done: eval acc {final['acc']:.3f}")

    # --- batched embedding export ---------------------------------------
    embedder = TextEmbedder(model, {"params": state.params}, tokenizer,
                            max_length=16, batch_size=64)

    # --- similar job: embed -> normalize -> IP top-k -> filter -> KV ----
    kv = InMemoryKVSink()
    written = nlp_similar_job(df, embedder, kv, k=13, score_th=0.7)
    example = df["spu_sn"].iloc[0]
    print(f"similar job wrote {written} keys; "
          f"dj_similar:{example} -> {kv.get(f'dj_similar:{example}')[:60]}")


if __name__ == "__main__":
    main()
