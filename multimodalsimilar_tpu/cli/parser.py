"""Argument parser + entry point: one subcommand tree covering every
reference job family, YAML config preloading, persistent compile cache."""

from __future__ import annotations

import argparse
import sys

from multimodalsimilar_tpu.cli.common import (_apply_yaml_config,
                                              _enable_compile_cache)
from multimodalsimilar_tpu.cli.train import (
    _add_common_train_flags, cmd_train_cv, cmd_train_fasttext,
    cmd_train_multilabel, cmd_train_multimodal, cmd_train_nlp,
    cmd_train_pair)
from multimodalsimilar_tpu.cli.embed import cmd_embed_bulk, cmd_embed_incremental
from multimodalsimilar_tpu.cli.similar import (cmd_similar_daodian,
                                               cmd_similar_multimodal,
                                               cmd_similar_nlp)
from multimodalsimilar_tpu.cli.serve import cmd_serve
from multimodalsimilar_tpu.cli.ckpt import (cmd_eval, cmd_export_checkpoint,
                                            cmd_import_checkpoint)
from multimodalsimilar_tpu.cli.ops import cmd_copy_kv, cmd_download


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("multimodalsimilar_tpu", allow_abbrev=False)
    sub = p.add_subparsers(dest="cmd", required=True)

    train = sub.add_parser("train", allow_abbrev=False).add_subparsers(dest="model",
                                                   required=True)
    t_nlp = train.add_parser("nlp", allow_abbrev=False)
    _add_common_train_flags(t_nlp)
    t_nlp.add_argument("--pool", default="cls", choices=["cls", "mean"],
                       help="cls = TransformerEmb pooler; mean = "
                            "TransformerSeqEmb masked mean")
    t_nlp.add_argument("--seq_buckets", default=None,
                     help="comma list of shorter seq buckets, e.g. 32,48,64 — trim\n"
                          "each batch to the smallest bucket covering its longest\n"
                          "row (the reference collator pads to batch max, not 128)")
    t_nlp.set_defaults(fn=cmd_train_nlp)

    t_ml = train.add_parser("multilabel", allow_abbrev=False)
    _add_common_train_flags(t_ml)
    t_ml.add_argument("--lv1_col", default="lv1_category_id")
    t_ml.add_argument("--seq_buckets", default=None,
                     help="comma list of shorter seq buckets, e.g. 32,48,64 — trim\n"
                          "each batch to the smallest bucket covering its longest\n"
                          "row (the reference collator pads to batch max, not 128)")
    t_ml.add_argument("--lv2_col", default="lv2_category_id")
    t_ml.add_argument("--tag_col", default="tag_new_id")
    t_ml.add_argument("--lv1_weight", type=float, default=10.0)
    t_ml.add_argument("--lv2_weight", type=float, default=5.0)
    t_ml.add_argument("--tag_weight", type=float, default=1.0)
    t_ml.set_defaults(fn=cmd_train_multilabel)

    t_cv = train.add_parser("cv", allow_abbrev=False)
    _add_common_train_flags(t_cv)
    # the cv daodian reference evaluates and checkpoints once per EPOCH
    # (cv_classifier_train_daodian.py:283,298-306) — resolved to
    # steps-per-epoch in cmd_train_cv when left unset
    t_cv.set_defaults(eval_every=None, save_every=None)
    t_cv.add_argument("--img_root", required=True)
    t_cv.add_argument("--key_col", default="goods_sku")
    t_cv.add_argument("--image_size", type=int, default=512)
    t_cv.add_argument("--fc_dim", type=int, default=512)
    t_cv.add_argument("--backbone", default="efficientnet_b4")
    t_cv.add_argument("--decode_cache", default=None,
                      help="directory for a resized-uint8 decode cache "
                           "(multi-epoch runs decode each image once)")
    t_cv.set_defaults(fn=cmd_train_cv, margin=0.2,
                      margin_delta_per_epoch=0.04,
                      label_col="tag_new_id")  # cv_dataset.py label column

    t_pair = train.add_parser("pair", allow_abbrev=False)
    _add_common_train_flags(t_pair)
    t_pair.add_argument("--seq_buckets", default=None,
                        help="shared seq buckets for both pair sides, e.g. 32,48")
    # the reference trains ALL params with ONE AdamW at 1e-3, warmup
    # 0.25*total (nlp_st_train_daodian.py:152-156) — same lr both groups,
    # same warmup both groups
    t_pair.set_defaults(fn=cmd_train_pair, tower_lr=1e-3, head_lr=1e-3,
                        tower_warmup_frac=0.25, head_warmup_frac=0.25)

    t_mm = train.add_parser("multimodal", allow_abbrev=False)
    _add_common_train_flags(t_mm)
    t_mm.add_argument("--img_root", required=True)
    t_mm.add_argument("--key_col", default="spu_sn")
    t_mm.add_argument("--image_size", type=int, default=380)
    t_mm.add_argument("--fc_dim", type=int, default=512)
    t_mm.add_argument("--backbone", default="efficientnet_b4")
    t_mm.add_argument("--decode_cache", default=None,
                      help="directory for a resized-uint8 decode cache")
    t_mm.add_argument("--seq_buckets", default=None,
                      help="comma list of shorter text seq buckets, "
                           "e.g. 48,64")
    t_mm.set_defaults(fn=cmd_train_multimodal, batch_size=48, margin=0.5)

    t_ft = train.add_parser("fasttext", allow_abbrev=False)
    t_ft.add_argument("--config")
    t_ft.add_argument("--data", required=True)
    t_ft.add_argument("--eval_data")
    t_ft.add_argument("--output", default="./output")
    t_ft.add_argument("--text_col", default="text")
    t_ft.add_argument("--label_col", default="label")
    t_ft.add_argument("--dim", type=int, default=100)
    t_ft.add_argument("--lr", type=float, default=0.1)
    t_ft.add_argument("--epochs", type=int, default=5)
    t_ft.add_argument("--chain_steps", type=int, default=None, metavar="K",
                      help="run K SGD steps per jitted program "
                           "(lax.scan): same math, one dispatch per K "
                           "steps. Default: 8 on TPU (measured 2.0x — "
                           "the per-program dispatch floor dominates "
                           "the ~5 ms on-chip step; PERF 'fastText "
                           "component'), 1 on CPU (dispatch is cheap)")
    t_ft.set_defaults(fn=cmd_train_fasttext)

    emb = sub.add_parser("embed", allow_abbrev=False).add_subparsers(dest="mode", required=True)
    e_inc = emb.add_parser("incremental", allow_abbrev=False)
    e_inc.add_argument("--config")
    e_inc.add_argument("--kind", default="text",
                       choices=["text", "cv", "fasttext"])
    e_inc.add_argument("--fasttext_model",
                       help="pickled FastTextClassifier (kind=fasttext)")
    e_inc.add_argument("--data", required=True)
    e_inc.add_argument("--table", required=True,
                       help="parquet table path, or hive://db.table on a "
                            "cluster host (Spark INSERT OVERWRITE)")
    e_inc.add_argument("--dt", default=None)
    e_inc.add_argument("--key_col", default="goods_sku")
    e_inc.add_argument("--text_col", default="spu_name")
    e_inc.add_argument("--tokenizer")
    e_inc.add_argument("--checkpoint")
    e_inc.add_argument("--bert_preset", default="tiny")
    e_inc.add_argument("--num_labels", type=int, default=2)
    e_inc.add_argument("--pool", default="cls",
                     choices=["cls", "mean"],
                     help="must match the trained model")
    e_inc.add_argument("--max_length", type=int, default=80)
    e_inc.add_argument("--batch_size", type=int, default=256)
    e_inc.add_argument("--length_buckets", default=None,
                    help="comma list of shorter seq buckets, e.g. 24,48 — sorts\n"
                         "rows by token length and runs short batches on a\n"
                         "proportionally cheaper program (output-identical)")
    e_inc.add_argument("--img_root", default="./goodssku_image_2")
    e_inc.add_argument("--backbone", default="efficientnet_b4")
    e_inc.add_argument("--fc_dim", type=int, default=512)
    e_inc.add_argument("--image_size", type=int, default=512)
    e_inc.add_argument("--int8", action="store_true",
                 help="int8 weight + dynamic-activation PTQ for the text "
                      "tower (models/quant.py) — cosine parity < 1e-3 vs "
                      "fp32 but measured SLOWER than the bf16 default on "
                      "this harness (61.3 vs 43.2 ms/batch, PERF.md "
                      "headroom #2); opt-in baseline for a future fused "
                      "int8 kernel")
    e_inc.add_argument("--emb_cache", default=None, metavar="DIR",
                 help="packed embedding cache directory (pipelines/"
                      "embcache.py): one data.bin instead of per-SKU "
                      "emb.txt text files — ≥10x faster cache reads at "
                      "warehouse key counts; existing emb.txt files are "
                      "migrated in on first miss")
    e_inc.set_defaults(fn=cmd_embed_incremental)

    e_bulk = emb.add_parser("bulk", allow_abbrev=False)
    e_bulk.add_argument("--config")
    e_bulk.add_argument("--data", required=True)
    e_bulk.add_argument("--table", required=True)
    e_bulk.add_argument("--key_col", default="goods_sku")
    e_bulk.add_argument("--text_col", default="spu_name")
    e_bulk.add_argument("--tokenizer")
    e_bulk.add_argument("--checkpoint")
    e_bulk.add_argument("--bert_preset", default="tiny")
    e_bulk.add_argument("--num_labels", type=int, default=2)
    e_bulk.add_argument("--pool", default="cls",
                     choices=["cls", "mean"],
                     help="must match the trained model")
    e_bulk.add_argument("--max_length", type=int, default=80)
    e_bulk.add_argument("--batch_size", type=int, default=256)
    e_bulk.add_argument("--length_buckets", default=None,
                    help="comma list of shorter seq buckets, e.g. 24,48 — sorts\n"
                         "rows by token length and runs short batches on a\n"
                         "proportionally cheaper program (output-identical)")
    e_bulk.add_argument("--kinds", default="bert",
                        help="comma list: bert,fasttext,cv")
    e_bulk.add_argument("--fasttext_model",
                        help="pickled FastTextClassifier (kind=fasttext)")
    e_bulk.add_argument("--img_root", default="./goodssku_image_2")
    e_bulk.add_argument("--backbone", default="efficientnet_b4")
    e_bulk.add_argument("--fc_dim", type=int, default=512)
    e_bulk.add_argument("--image_size", type=int, default=512)
    e_bulk.add_argument("--int8", action="store_true",
                 help="int8 weight + dynamic-activation PTQ for the text "
                      "tower (models/quant.py) — cosine parity < 1e-3 vs "
                      "fp32 but measured SLOWER than the bf16 default on "
                      "this harness (61.3 vs 43.2 ms/batch, PERF.md "
                      "headroom #2); opt-in baseline for a future fused "
                      "int8 kernel")
    e_bulk.set_defaults(fn=cmd_embed_bulk)

    sim = sub.add_parser("similar", allow_abbrev=False).add_subparsers(dest="mode",
                                                   required=True)
    s_nlp = sim.add_parser("nlp", allow_abbrev=False)
    s_nlp.add_argument("--config")
    s_nlp.add_argument("--data", required=True)
    s_nlp.add_argument("--dt", default=None)
    s_nlp.add_argument("--key_col", default="spu_sn")
    s_nlp.add_argument("--text_col", default="spu_name")
    s_nlp.add_argument("--tokenizer")
    s_nlp.add_argument("--checkpoint")
    s_nlp.add_argument("--bert_preset", default="tiny")
    s_nlp.add_argument("--num_labels", type=int, default=2)
    s_nlp.add_argument("--pool", default="cls",
                     choices=["cls", "mean"],
                     help="must match the trained model")
    s_nlp.add_argument("--max_length", type=int, default=128)
    s_nlp.add_argument("--batch_size", type=int, default=256)
    s_nlp.add_argument("--length_buckets", default=None,
                    help="comma list of shorter seq buckets, e.g. 24,48 — sorts\n"
                         "rows by token length and runs short batches on a\n"
                         "proportionally cheaper program (output-identical)")
    s_nlp.add_argument("--k", type=int, default=13)
    s_nlp.add_argument("--score_th", type=float, default=0.9)
    s_nlp.add_argument("--redis_host", default=None)
    s_nlp.add_argument("--redis_port", type=int, default=6379)
    s_nlp.add_argument("--redis_db", type=int, default=15)
    s_nlp.add_argument("--redis_password", default=None)
    s_nlp.add_argument("--exp_seconds", type=int, default=7 * 24 * 3600)
    s_nlp.add_argument("--profile", default=None, metavar="DIR",
                 help="jax.profiler trace of the job to DIR")
    s_nlp.add_argument("--pallas_topk", action="store_true",
                 help="use the Pallas streaming top-k kernel (ops/topk.py) "
                      "instead of the XLA blockwise scan — exact same "
                      "results; measured ~5x SLOWER through this harness's "
                      "remote Mosaic path (PERF.md headroom #4); opt-in "
                      "for direct-attach TPUs")
    s_nlp.add_argument("--approx_recall", type=float, default=None,
                 metavar="R",
                 help="APPROXIMATE k-NN: per-block recall target in "
                      "(0, 1] via the TPU approx_max_k PartialReduce op "
                      "(no sort-based top_k). The reference's FAISS "
                      "IndexFlat is exact — this is a deliberate "
                      "recall/throughput trade; single-chip, exact "
                      "fallback off-TPU (retrieval/knn.py)")
    s_nlp.add_argument("--int8", action="store_true",
                 help="int8 weight + dynamic-activation PTQ for the text "
                      "tower (models/quant.py) — cosine parity < 1e-3 vs "
                      "fp32 but measured SLOWER than the bf16 default on "
                      "this harness (61.3 vs 43.2 ms/batch, PERF.md "
                      "headroom #2); opt-in baseline for a future fused "
                      "int8 kernel")
    s_nlp.set_defaults(fn=cmd_similar_nlp)

    s_mm = sim.add_parser("multimodal", allow_abbrev=False)
    s_mm.add_argument("--config")
    s_mm.add_argument("--data", required=True,
                      help="table with spu_sn + fused embedding strings")
    s_mm.add_argument("--embedding_col", default="multimodal_emb")
    s_mm.add_argument("--checkpoint",
                      help="multimodal orbax checkpoint: compute fused "
                           "embeddings in-process (multimodal_infer.py "
                           "pattern)")
    s_mm.add_argument("--tokenizer")
    s_mm.add_argument("--text_col", default="spu_name")
    s_mm.add_argument("--img_root", default="./goodssku_image_2")
    s_mm.add_argument("--image_size", type=int, default=380)
    s_mm.add_argument("--fc_dim", type=int, default=512)
    s_mm.add_argument("--backbone", default="efficientnet_b4")
    s_mm.add_argument("--bert_preset", default="tiny")
    s_mm.add_argument("--num_labels", type=int, default=2)
    s_mm.add_argument("--max_length", type=int, default=128)
    s_mm.add_argument("--batch_size", type=int, default=48)
    s_mm.add_argument("--key_col", default="spu_sn")
    s_mm.add_argument("--k", type=int, default=13)
    s_mm.add_argument("--redis_host", default=None)
    s_mm.add_argument("--redis_port", type=int, default=6379)
    s_mm.add_argument("--redis_db", type=int, default=15)
    s_mm.add_argument("--redis_password", default=None)
    s_mm.add_argument("--exp_seconds", type=int, default=7 * 24 * 3600)
    s_mm.add_argument("--profile", default=None, metavar="DIR",
                help="jax.profiler trace of the job to DIR")
    s_mm.add_argument("--pallas_topk", action="store_true",
                 help="use the Pallas streaming top-k kernel (ops/topk.py) "
                      "instead of the XLA blockwise scan — exact same "
                      "results; measured ~5x SLOWER through this harness's "
                      "remote Mosaic path (PERF.md headroom #4); opt-in "
                      "for direct-attach TPUs")
    s_mm.add_argument("--approx_recall", type=float, default=None,
                 metavar="R",
                 help="APPROXIMATE k-NN: per-block recall target in "
                      "(0, 1] via the TPU approx_max_k PartialReduce op "
                      "(no sort-based top_k). The reference's FAISS "
                      "IndexFlat is exact — this is a deliberate "
                      "recall/throughput trade; single-chip, exact "
                      "fallback off-TPU (retrieval/knn.py)")
    s_mm.set_defaults(fn=cmd_similar_multimodal)

    s_dd = sim.add_parser("daodian", allow_abbrev=False)
    s_dd.add_argument("--config")
    s_dd.add_argument("--data", required=True)
    s_dd.add_argument("--dt", default=None)
    s_dd.add_argument("--date_keyed", action="store_true",
                      help="v2 semantics: write {yyyymmdd}:{spu_sn} keys")
    s_dd.add_argument("--dt_col", default=None,
                      help="v2_recent_days: column holding each row's dt; "
                           "with --date_keyed, only neighbors whose dt "
                           "equals --dt survive and retrieval depth scales "
                           "to len(area)/recent_days")
    s_dd.add_argument("--recent_days", type=int, default=7,
                      help="v2 history window length (days of corpus)")
    s_dd.add_argument("--text_only", action="store_true",
                      help="explicitly run without the CV side")
    s_dd.add_argument("--fasttext_model", required=True,
                      help="pickled FastTextClassifier")
    s_dd.add_argument("--cv_checkpoint", default=None)
    s_dd.add_argument("--cv_num_labels", type=int, default=4181)
    s_dd.add_argument("--backbone", default="efficientnet_b4")
    s_dd.add_argument("--fc_dim", type=int, default=512)
    s_dd.add_argument("--image_size", type=int, default=512)
    s_dd.add_argument("--img_root", default="./goodssku_image_2")
    s_dd.add_argument("--key_col", default="spu_sn")
    s_dd.add_argument("--sku_col", default="sku")
    s_dd.add_argument("--redis_host", default=None)
    s_dd.add_argument("--redis_port", type=int, default=6379)
    s_dd.add_argument("--redis_db", type=int, default=15)
    s_dd.add_argument("--redis_password", default=None)
    s_dd.add_argument("--exp_seconds", type=int, default=None,
                      help="KV TTL; default 7d for v1 keys, 1.5d when "
                           "--date_keyed (daodian_infer_v2_*.py:342)")
    s_dd.add_argument("--profile", default=None, metavar="DIR",
                help="jax.profiler trace of the job to DIR")
    s_dd.add_argument("--pallas_topk", action="store_true",
                 help="use the Pallas streaming top-k kernel (ops/topk.py) "
                      "instead of the XLA blockwise scan — exact same "
                      "results; measured ~5x SLOWER through this harness's "
                      "remote Mosaic path (PERF.md headroom #4); opt-in "
                      "for direct-attach TPUs")
    s_dd.add_argument("--approx_recall", type=float, default=None,
                 metavar="R",
                 help="APPROXIMATE k-NN: per-block recall target in "
                      "(0, 1] via the TPU approx_max_k PartialReduce op "
                      "(no sort-based top_k). The reference's FAISS "
                      "IndexFlat is exact — this is a deliberate "
                      "recall/throughput trade; single-chip, exact "
                      "fallback off-TPU (retrieval/knn.py)")
    s_dd.add_argument("--emb_cache", default=None, metavar="DIR",
                 help="packed embedding cache directory (pipelines/"
                      "embcache.py): one data.bin instead of per-SKU "
                      "emb.txt text files — ≥10x faster cache reads at "
                      "warehouse key counts; existing emb.txt files are "
                      "migrated in on first miss")
    s_dd.set_defaults(fn=cmd_similar_daodian)

    srv = sub.add_parser("serve", allow_abbrev=False)
    srv.add_argument("--config")
    srv.add_argument("--tower", default="bert",
                     choices=["bert", "cv", "multimodal", "fasttext",
                              "daodian"],
                     help="bert: text queries ({'text': ...}); cv: image "
                          "queries ({'image_b64'|'image_path': ...}) "
                          "against the EfficientNet/ViT tower (the online "
                          "daodian image job); multimodal: fused "
                          "text+image pairs, un-normalized L2 like "
                          "multimodal_infer; fasttext: text queries on "
                          "fastText sentence vectors (the daodian text "
                          "side); daodian: BOTH production arms hot — one "
                          "request returns the nightly job's merged "
                          "cv-first-then-fastText list per key "
                          "(daodian_infer.py:361-392)")
    srv.add_argument("--data", required=True,
                     help="corpus table (csv/parquet/hive://db.table)")
    srv.add_argument("--key_col", default="spu_sn")
    srv.add_argument("--text_col", default="spu_name")
    srv.add_argument("--category_col", default=None,
                     help="corpus category column: requests passing "
                          "'category' keep only same-category neighbors "
                          "(the batch jobs' same-lv1/lv2 rule, online)")
    srv.add_argument("--tokenizer")
    srv.add_argument("--checkpoint")
    srv.add_argument("--bert_preset", default="tiny")
    srv.add_argument("--num_labels", type=int, default=2)
    srv.add_argument("--pool", default="cls", choices=["cls", "mean"],
                     help="must match the trained model")
    srv.add_argument("--max_length", type=int, default=128)
    srv.add_argument("--batch_size", type=int, default=64,
                     help="device batch the micro-batches pad to (ONE "
                          "compiled program; keep >= --max_batch)")
    srv.add_argument("--length_buckets", default=None,
                     help="comma list of shorter seq buckets, e.g. 24,48")
    srv.add_argument("--k", type=int, default=13)
    srv.add_argument("--score_th", type=float, default=None,
                     help="default score threshold (requests may override "
                          "with 'score_th', null disables). Unset, each "
                          "tower uses its reference job's operating "
                          "point: bert 0.9, cv 0.15, fasttext -0.6, "
                          "multimodal none (L2: th = max distance)")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8476,
                     help="0 picks a free port (printed on the ready line)")
    srv.add_argument("--max_batch", type=int, default=64,
                     help="max requests coalesced into one device call")
    srv.add_argument("--emb_table", default=None,
                     help="warm-start the corpus from a precomputed "
                          "embedding table (the nightly 'embed' jobs' "
                          "output: key_col + '[x,y,...]' strings; "
                          "csv/parquet/hive://db.table). Corpus keys "
                          "found there skip the startup tower pass "
                          "(cv/multimodal: hit keys need no image on "
                          "disk); missing keys embed fresh. All four "
                          "towers; multimodal tables must hold "
                          "UN-normalized vectors (IndexFlatL2 "
                          "semantics)")
    srv.add_argument("--emb_col", default="embedding",
                     help="embedding column in --emb_table")
    srv.add_argument("--emb_table_cache", default=None, metavar="DIR",
                     help="restart cache for --emb_table: first start "
                          "parses the table and mirrors it as npy "
                          "(mtime-validated); later starts mmap it in "
                          "seconds (parquet decode alone is ~3 min at "
                          "1M x 768 on this host)")
    srv.add_argument("--max_wait_ms", type=float, default=5.0,
                     help="how long the device worker waits for more "
                          "requests after the first — burst latency floor")
    srv.add_argument("--pallas_topk", action="store_true",
                     help="Pallas streaming top-k kernel instead of the "
                          "XLA scan (see 'similar nlp --pallas_topk')")
    srv.add_argument("--approx_recall", type=float, default=None,
                     metavar="R",
                     help="APPROXIMATE k-NN via the TPU approx_max_k op "
                          "(see 'similar nlp --approx_recall')")
    srv.add_argument("--int8", action="store_true",
                     help="int8 PTQ text tower (see 'similar nlp --int8')")
    # --tower cv / multimodal options (ignored for bert)
    srv.add_argument("--backbone", default="efficientnet_b4")
    srv.add_argument("--fc_dim", type=int, default=512)
    srv.add_argument("--image_size", type=int, default=512)
    srv.add_argument("--img_root", default="./goodssku_image_2",
                     help="cv corpus images: {img_root}/{key}/0..7.jpg "
                          "(mean embedding, the daodian layout); "
                          "multimodal corpus images: {img_root}/{key}.jpg")
    srv.add_argument("--emb_cache", default=None, metavar="DIR",
                     help="packed embedding cache for the cv corpus "
                          "(pipelines/embcache.py)")
    # --tower fasttext option
    srv.add_argument("--fasttext_model",
                     help="pickled FastTextClassifier (--tower fasttext "
                          "and --tower daodian's text arm; train one "
                          "with: cli train fasttext)")
    # --tower daodian options (the merged production job online)
    srv.add_argument("--area_col", default="area_id",
                     help="daodian: per-area retrieval column "
                          "(daodian_infer.py:361)")
    srv.add_argument("--sku_col", default="sku",
                     help="daodian: goods_sku column naming the image "
                          "folder for the CV arm")
    srv.add_argument("--cv_checkpoint", default=None,
                     help="daodian: orbax checkpoint for the CV arm's "
                          "tower")
    srv.add_argument("--cv_num_labels", type=int, default=4181,
                     help="daodian: CV checkpoint head width "
                          "(cv_classifier_train_daodian.py:190)")
    srv.add_argument("--text_only", action="store_true",
                     help="daodian: explicitly serve without the CV arm")
    # the merged tower has TWO thresholds and TWO depths — the generic
    # --score_th/--k are refused for it (advisor finding: they were
    # silently ignored); these default to the production constants
    # (daodian_infer.py:79-82)
    srv.add_argument("--nlp_score_th", type=float, default=-0.6,
                     help="daodian: text-arm score threshold "
                          "(daodian_infer.py:81)")
    srv.add_argument("--cv_score_th", type=float, default=0.15,
                     help="daodian: CV-arm score threshold "
                          "(daodian_infer.py:82)")
    srv.add_argument("--ann_cnt_nlp", type=int, default=100,
                     help="daodian: text-arm retrieval depth "
                          "(daodian_infer.py:80)")
    srv.add_argument("--ann_cnt_cv", type=int, default=26,
                     help="daodian: CV-arm retrieval depth "
                          "(daodian_infer.py:79)")
    srv.set_defaults(fn=cmd_serve)

    ckv = sub.add_parser("copy-kv", allow_abbrev=False)
    ckv.add_argument("--config")
    ckv.add_argument("--src_host", required=True)
    ckv.add_argument("--src_port", type=int, default=6379)
    ckv.add_argument("--src_db", type=int, default=0)
    ckv.add_argument("--dst_host", required=True)
    ckv.add_argument("--dst_port", type=int, default=6379)
    ckv.add_argument("--dst_db", type=int, default=0)
    ckv.add_argument("--redis_password", default=None)
    ckv.add_argument("--pattern", default="*")
    ckv.add_argument("--exp_seconds", type=int, default=7 * 24 * 3600)
    ckv.set_defaults(fn=cmd_copy_kv)

    ev = sub.add_parser("eval", allow_abbrev=False)
    ev.add_argument("--config")
    ev.add_argument("--data", required=True)
    ev.add_argument("--checkpoint")
    ev.add_argument("--tokenizer")
    ev.add_argument("--text_col", default="spu_name")
    ev.add_argument("--label_col", default="labels")
    ev.add_argument("--max_length", type=int, default=128)
    ev.add_argument("--batch_size", type=int, default=256)
    ev.add_argument("--num_labels", type=int, default=None,
                    help="the TRAINING class count — for a checkpoint "
                         "padded by --model_parallel, the VALID (unpadded) "
                         "count, e.g. 10205 for a 10208-padded head (pad "
                         "classes are masked like the in-loop eval). "
                         "Default: derived from this split, which breaks "
                         "if the split lacks the top label")
    ev.add_argument("--pool", default="cls",
                    choices=["cls", "mean"],
                    help="must match the trained model (--pool at train "
                         "time)")
    ev.add_argument("--seq_buckets", default=None,
                    help="comma list of shorter seq buckets, e.g. 48,64")
    ev.add_argument("--bert_preset", default="tiny")
    ev.set_defaults(fn=cmd_eval)

    imp = sub.add_parser("import-checkpoint", allow_abbrev=False)
    imp.add_argument("--config")
    imp.add_argument("--kind", required=True,
                     choices=["nlp", "multilabel", "siamese", "cv",
                              "multimodal"])
    imp.add_argument("--state_dict", required=True,
                     help="torch state_dict .pt file")
    imp.add_argument("--out", required=True, help="orbax checkpoint dir")
    imp.add_argument("--bert_preset", default="base")
    imp.add_argument("--backbone", default="efficientnet_b4")
    imp.add_argument("--overwrite", action="store_true",
                     help="clear an already-populated --out dir (without "
                          "this, importing into one fails fast — existing "
                          "later steps would shadow the imported weights)")
    imp.add_argument("--pipeline_parallel", type=int, default=0,
                     metavar="M",
                     help="write the BERT tower in the pipeline-parallel "
                          "stacked layout (pp_layers) so the imported "
                          "weights warm-start `train ... "
                          "--pipeline_parallel` runs (M is accepted for "
                          "symmetry with train; any value > 0 stacks)")
    imp.set_defaults(fn=cmd_import_checkpoint)

    exp = sub.add_parser("export-checkpoint", allow_abbrev=False)
    exp.add_argument("--config")
    exp.add_argument("--kind", required=True,
                     choices=["nlp", "multilabel", "siamese", "cv",
                              "multimodal"])
    exp.add_argument("--checkpoint", required=True,
                     help="orbax checkpoint dir")
    exp.add_argument("--out", required=True,
                     help="output torch state_dict .pt file")
    exp.add_argument("--bert_preset", default="base")
    exp.add_argument("--backbone", default="efficientnet_b4")
    exp.set_defaults(fn=cmd_export_checkpoint)

    dl = sub.add_parser("download", allow_abbrev=False)
    dl.add_argument("--config")
    dl.add_argument("--manifest", required=True,
                    help="csv with key/img_id/url columns")
    dl.add_argument("--out_root", required=True)
    dl.add_argument("--key_col", default="goods_sku")
    dl.add_argument("--img_id_col", default="img_id")
    dl.add_argument("--url_col", default="url")
    dl.add_argument("--threads", type=int, default=20)
    dl.set_defaults(fn=cmd_download)

    return p

def _subparser_for(parser, argv):
    """The (possibly nested — ``train nlp``) subparser the leading
    positional tokens select; None if the path is absent or unknown
    (argparse will produce its own error for those)."""
    import argparse as _ap
    node = parser
    for tok in argv:
        if tok.startswith("-"):
            break                       # flags end the command path
        nxt = None
        for action in node._actions:
            if isinstance(action, _ap._SubParsersAction):
                nxt = action.choices.get(tok)
                break
        if nxt is None:
            return None
        node = nxt
    return node if node is not parser else None

def _inject_yaml_argv(argv, parser):
    """Expand ``--config file.yaml`` into argv tokens BEFORE parsing, so a
    YAML file can satisfy required flags (--data, --table, ...) — applying
    the YAML only after parse_args meant every required flag still had to
    be duplicated on the command line. Explicit flags still win: keys
    already present in argv are not injected.

    Keys are validated against the selected subcommand's known flags
    first, so a mistyped YAML key dies with the clear unknown-flags error
    rather than argparse's bare 'unrecognized arguments'; values inject in
    ``--key=value`` form so a string value starting with '-' can't be
    misparsed as a flag (advisor finding)."""
    cfg_path = None
    for i, tok in enumerate(argv):
        if tok == "--config" and i + 1 < len(argv):
            cfg_path = argv[i + 1]
        elif tok.startswith("--config="):
            cfg_path = tok.split("=", 1)[1]
    if not cfg_path:
        return argv
    import yaml
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f) or {}
    sub = _subparser_for(parser, argv)
    known = sub._option_string_actions if sub is not None else None
    if known is not None:
        unknown = [k for k in cfg if f"--{k}" not in known]
        if unknown:
            raise SystemExit(f"--config {cfg_path}: unknown flags "
                             f"{unknown}")
    extra = []
    for k, v in cfg.items():
        explicit = any(t == f"--{k}" or t.startswith(f"--{k}=")
                       for t in argv)
        if explicit or v is None or k == "config":
            continue
        if isinstance(v, bool):
            # store_true flags take no =value — inject the bare flag
            if v:
                extra.append(f"--{k}")
        elif isinstance(v, (list, tuple)):
            # YAML lists (seq_buckets: [48, 64]) inject as the comma form
            # the flags parse — str(list) would reach int() as '[48'
            extra.append(f"--{k}=" + ",".join(str(x) for x in v))
        else:
            extra.append(f"--{k}={v}")
    return list(argv) + extra

def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    parser = build_parser()
    argv = _inject_yaml_argv(argv, parser)
    args = parser.parse_args(argv)
    _apply_yaml_config(args, argv)
    _enable_compile_cache()
    profile = getattr(args, "profile", None)
    from multimodalsimilar_tpu.data.datasets import InputError
    try:
        if profile and not args.fn.__name__.startswith("cmd_train"):
            # train commands trace a steady-state step window themselves
            # (TrainerConfig.profile_dir); serving jobs trace the whole job
            from multimodalsimilar_tpu.utils.profiling import trace
            with trace(profile):
                args.fn(args)
        else:
            args.fn(args)
    except InputError as e:
        # narrow on purpose: only bad-input errors collapse to one line —
        # anything else keeps its traceback for debugging
        raise SystemExit(f"error: {e}")
