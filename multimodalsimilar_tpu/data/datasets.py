"""Batched dataset sources producing fixed-shape numpy batches.

The reference pipes HF datasets -> torch DataLoader per script; here each
source materializes static-shape batches directly (TPU programs are compiled
per shape — every batch of a job must look identical), and
``data.prefetch.prefetch_to_device`` overlaps host work with device steps.

Sources:
* TextClassificationSource  <- the load_dataset("csv"/"parquet") + tokenize
  pipelines (nlp_classifier_train.py:70-87, .._v2.py:85-105)
* ImageClassificationSource <- CvDataset + None-filtering collate
  (cv_dataset.py:13-43, cv_classifier_train_daodian.py:178-180); failed
  decodes are skipped and the batch topped up from the sampler, so batches
  stay full and static
* MultimodalSource          <- MultimodalDataset (multimodal_dataset.py:34-65)
* PairTextSource            <- NlpSTDataset pair batches (nlp_st_datasets.py)
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from multimodalsimilar_tpu.data import images as I
from multimodalsimilar_tpu.data.sampling import PairSampler, WeightedSampler
from multimodalsimilar_tpu.utils.buckets import bucket_ladder
from multimodalsimilar_tpu.data.text import preprocess_for_infer
from multimodalsimilar_tpu.data.tokenizer import TextTokenizer

Batch = Dict[str, np.ndarray]


class InputError(ValueError):
    """Bad job input (missing table / missing columns). The CLI renders
    these as a one-line error; anything else keeps its full traceback."""


def read_table(path: str, require: Sequence[str] = ()) -> pd.DataFrame:
    """CSV or parquet by extension (the reference's two input formats), or
    a Hive pull on a cluster host.

    ``hive://db.table`` pulls the whole table and ``hivesql://<SQL>`` runs
    an arbitrary query, both via the Spark adapter
    (pipelines/spark.py SparkTableSource) — the reference jobs all start
    with exactly this ``spark.sql(...).toPandas()`` boundary
    (nlp_infer.py:112-116, goodssku_emb_bert_di.py:111-123), so every
    ``--data`` flag accepts the same warehouse addresses. ``require``
    lists columns the caller needs — missing ones produce one clear error
    naming the file and its actual columns instead of a pandas KeyError
    deep in a job. Other URL-style paths (s3://, https://) pass straight
    to pandas (the warehouse-extract ingestion seam)."""
    if path.startswith(("hive://", "hivesql://")):
        from multimodalsimilar_tpu.pipelines.spark import (
            SparkTableSource, spark_session)
        query = (path[len("hivesql://"):] if path.startswith("hivesql://")
                 else f"select * from {path[len('hive://'):]}")
        df = SparkTableSource(spark_session("multimodalsimilar_tpu")).sql(
            query)
    else:
        if "://" not in path and not os.path.exists(path):
            raise InputError(f"input table not found: {path}")
        df = (pd.read_parquet(path) if path.endswith(".parquet")
              else pd.read_csv(path))
    missing = [c for c in require if c not in df.columns]
    if missing:
        raise InputError(
            f"{path}: missing column(s) {missing}; found "
            f"{list(df.columns)} — point the matching --*_col flags at "
            f"your table's column names")
    return df


def _bounded_map(pool, fn, iterable, window: int):
    """``pool.map`` with backpressure: at most ``window`` tasks in flight,
    results in submission order.

    ``Executor.map`` submits the WHOLE iterable up front — with a decode
    producer faster than the consumer (warm cache feeding a transfer-bound
    device), completed futures buffer decoded float32 images unboundedly
    (an epoch-sized queue OOMs the host), and abandoning the generator
    mid-epoch blocks in shutdown(wait=True) until every remaining decode
    finishes. The bounded window caps buffered results at ``window``
    items and cancels not-yet-started work on early exit."""
    from collections import deque
    pending = deque()
    it = iter(iterable)
    try:
        for x in it:
            pending.append(pool.submit(fn, x))
            if len(pending) >= window:
                yield pending.popleft().result()
        while pending:
            yield pending.popleft().result()
    finally:
        for f in pending:
            f.cancel()


def _diagnose_skips(skipped: int, total: int, path_fn, df) -> None:
    """Per-item decode failures are skipped (cv_dataset.py:33-41 returns
    None and the collate drops it) — but 100% failure means a wrong
    --img_root/--key_col, and silently completing every epoch with zero
    batches made a broken multi-hour job look successful. Fail loud when
    NOTHING decoded; warn with a count otherwise."""
    if skipped and skipped == total:
        hint = path_fn(df.iloc[0]) if len(df) else "?"
        raise RuntimeError(
            f"all {skipped} sampled images failed to decode (first "
            f"expected path: {hint!r}) — check --img_root / --key_col")
    if skipped:
        import sys
        print(f"warning: skipped {skipped}/{total} rows with "
              f"missing/corrupt images this epoch", file=sys.stderr,
              flush=True)


def _epoch_order(n: int, shuffle: bool, seed: int, epoch: int,
                 sampler: Optional[WeightedSampler]) -> np.ndarray:
    if sampler is not None:
        return np.fromiter(iter(sampler), np.int64, len(sampler))
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed + epoch).shuffle(order)
    return order


class TextClassificationSource:
    """(title, label...) rows -> tokenized batches.

    label_cols may be one column (single-head ArcFace) or several (the
    3-level multilabel job, nlp_classifier_train_daodian_v3_dist.py).

    ``seq_buckets`` (e.g. ``(32, 48, 64)``) trims each batch's token arrays
    to the smallest bucket covering the batch's longest row — the static-
    shape analogue of the reference's DataCollatorWithPadding, which pads
    to the *batch* max rather than max_length (nlp_classifier_train.py:82-87)
    so its real GPU batches are far shorter than 128. Sampling order is
    untouched (no sorting); the train step compiles once per bucket.
    """

    def __init__(self, df: pd.DataFrame, tokenizer: TextTokenizer,
                 text_col: str = "spu_name",
                 label_cols: Union[str, Sequence[str]] = "labels",
                 max_length: int = 128, clean: bool = True,
                 seq_buckets: Optional[Sequence[int]] = None):
        self.df = df.reset_index(drop=True)
        self.tokenizer = tokenizer
        self.text_col = text_col
        self.label_cols = ([label_cols] if isinstance(label_cols, str)
                           else list(label_cols))
        self.max_length = max_length
        self.seq_buckets = bucket_ladder(seq_buckets, max_length)
        texts = self.df[text_col].astype(str).tolist()
        self.texts = preprocess_for_infer(texts) if clean else texts

    def __len__(self):
        return len(self.df)

    def materialize(self, idx: np.ndarray) -> Batch:
        batch = dict(self.tokenizer([self.texts[i] for i in idx],
                                    self.max_length))
        if self.seq_buckets:
            need = int(batch["attention_mask"].sum(axis=1).max())
            bucket = next(b for b in self.seq_buckets if b >= need)
            batch = {k: (v[:, :bucket] if v.ndim == 2
                         and v.shape[1] == self.max_length else v)
                     for k, v in batch.items()}
        for col in self.label_cols:
            key = "labels" if len(self.label_cols) == 1 else col
            batch[key] = self.df[col].values[idx].astype(np.int32)
        return batch

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                epoch: int = 0, sampler: Optional[WeightedSampler] = None,
                drop_remainder: bool = True) -> Iterator[Batch]:
        order = _epoch_order(len(self), shuffle, seed, epoch, sampler)
        stop = (len(order) - batch_size + 1) if drop_remainder \
            else len(order)
        for s in range(0, max(stop, 0), batch_size):
            yield self.materialize(order[s: s + batch_size])


class ImageClassificationSource:
    """{img_root}/{key}.jpg images + integer labels -> NHWC batches.

    Decode failures are *skipped and replaced* by the next sampler index
    (vs the reference's shrinking batches) so every batch has the same
    static shape. ``from_image_folder`` ingests the timm ImageFolder layout
    used by cv_classifier_train.py:41-49 ({root}/{class_name}/{img}).
    """

    @classmethod
    def from_image_folder(cls, root: str, image_size: int = 224,
                          train_aug: bool = False
                          ) -> "ImageClassificationSource":
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        rows = []
        for li, cname in enumerate(classes):
            cdir = os.path.join(root, cname)
            for fname in sorted(os.listdir(cdir)):
                rows.append({"path": os.path.join(cdir, fname),
                             "label": li, "class_name": cname})
        df = pd.DataFrame(rows)
        return cls(df, root, key_col="path", label_col="label",
                   image_size=image_size, train_aug=train_aug,
                   path_fn=lambda row: row["path"])

    def __init__(self, df: pd.DataFrame, img_root: str,
                 key_col: str = "goods_sku", label_col: str = "tag_new_id",
                 image_size: int = 512, train_aug: bool = False,
                 path_fn: Optional[Callable[[pd.Series], str]] = None,
                 num_workers: int = 8,
                 decode_cache: Optional[str] = None,
                 emit: str = "float32"):
        """decode_cache: directory for a DecodedCache (decode each image once
        across the reference's 100-epoch runs). emit: 'float32' (normalized
        on host, the safe library default) or 'uint8' (normalize on device
        via models.vision.device_normalize — what the CLI train/embed paths
        use: 4x smaller transfers, less host work)."""
        self.df = df.reset_index(drop=True)
        self.img_root = img_root
        self.key_col, self.label_col = key_col, label_col
        self.image_size = image_size
        self.train_aug = train_aug
        self.num_workers = num_workers
        if emit not in ("float32", "uint8"):
            raise ValueError(f"emit must be float32|uint8, got {emit}")
        self.emit = emit
        self.cache = (I.DecodedCache.open(decode_cache, image_size)
                      if decode_cache else None)
        self.path_fn = path_fn or (
            lambda row: os.path.join(img_root, f"{row[key_col]}.jpg"))

    def __len__(self):
        return len(self.df)

    def _load(self, i: int, rng: np.random.Generator
              ) -> Optional[np.ndarray]:
        path = self.path_fn(self.df.iloc[i])
        host_norm = self.emit == "float32"
        if self.train_aug:
            return I.load_train(path, self.image_size, rng, cache=self.cache,
                                normalize_host=host_norm)
        return I.load_eval(path, self.image_size, cache=self.cache,
                           normalize_host=host_norm)

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                epoch: int = 0, sampler: Optional[WeightedSampler] = None,
                drop_remainder: bool = True) -> Iterator[Batch]:
        """Decode runs on a thread pool (cv2 releases the GIL) — the host
        must outpace the accelerator (~1.8k B4 images/s on v5e); the
        reference's serial per-row decode cannot."""
        from concurrent.futures import ThreadPoolExecutor
        order = list(_epoch_order(len(self), shuffle, seed, epoch, sampler))
        labels_all = self.df[self.label_col].values
        imgs: List[np.ndarray] = []
        labels: List[int] = []
        skipped = 0

        def load(args):
            pos, i = args
            # independent per-item rng: reproducible under threading
            rng = np.random.default_rng((seed * 1000 + epoch) * 100003 + pos)
            return i, self._load(int(i), rng)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            window = max(self.num_workers * 4, batch_size)
            for i, img in _bounded_map(pool, load, enumerate(order), window):
                if img is None:
                    skipped += 1
                    continue
                imgs.append(img)
                labels.append(int(labels_all[int(i)]))
                if len(imgs) == batch_size:
                    yield {"images": np.stack(imgs),
                           "labels": np.asarray(labels, np.int32)}
                    imgs, labels = [], []
        if imgs and not drop_remainder:
            yield {"images": np.stack(imgs),
                   "labels": np.asarray(labels, np.int32)}
        _diagnose_skips(skipped, len(order), self.path_fn, self.df)


class MultimodalSource:
    """Tokenized titles + images + labels (multimodal_dataset.py semantics:
    clean title, tokenize at max_len 128; image at {img_root}/{spu_sn}.jpg)."""

    def __init__(self, df: pd.DataFrame, tokenizer: TextTokenizer,
                 img_root: str, text_col: str = "spu_name",
                 key_col: str = "spu_sn", label_col: str = "cateid",
                 max_length: int = 128, image_size: int = 380,
                 train_aug: bool = False,
                 decode_cache: Optional[str] = None,
                 emit: str = "float32",
                 seq_buckets: Optional[Sequence[int]] = None,
                 clean: bool = True):
        self.text = TextClassificationSource(df, tokenizer, text_col,
                                             label_col, max_length,
                                             clean=clean,
                                             seq_buckets=seq_buckets)
        self.image = ImageClassificationSource(
            df, img_root, key_col, label_col, image_size, train_aug,
            decode_cache=decode_cache, emit=emit)
        self.df = self.text.df

    def __len__(self):
        return len(self.df)

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                epoch: int = 0, sampler: Optional[WeightedSampler] = None,
                drop_remainder: bool = True) -> Iterator[Batch]:
        # pooled decode with the same bounded window + per-item rng as
        # ImageClassificationSource — the serial loop ran at single-core
        # decode rate (~60-80 img/s at 512px) while the pooled path exists
        # precisely because the host must outpace the accelerator
        from concurrent.futures import ThreadPoolExecutor
        order = list(_epoch_order(len(self), shuffle, seed, epoch, sampler))
        keep: List[int] = []
        imgs: List[np.ndarray] = []
        skipped = 0

        def load(args):
            pos, i = args
            rng = np.random.default_rng((seed * 1000 + epoch) * 100003 + pos)
            return i, self.image._load(int(i), rng)

        with ThreadPoolExecutor(
                max_workers=self.image.num_workers) as pool:
            window = max(self.image.num_workers * 4, batch_size)
            for i, img in _bounded_map(pool, load, enumerate(order), window):
                if img is None:
                    skipped += 1
                    continue
                keep.append(int(i))
                imgs.append(img)
                if len(keep) == batch_size:
                    batch = self.text.materialize(np.asarray(keep))
                    batch["images"] = np.stack(imgs)
                    yield batch
                    keep, imgs = [], []
        if keep and not drop_remainder:
            batch = self.text.materialize(np.asarray(keep))
            batch["images"] = np.stack(imgs)
            yield batch
        _diagnose_skips(skipped, len(order), self.image.path_fn,
                        self.image.df)


class PairTextSource:
    """Siamese pair batches via PairSampler (NlpSTDataset capability).

    ``seq_buckets`` trims BOTH sides to one shared bucket covering the
    batch's longest row on either side (one compiled program per bucket,
    not per bucket pair) — see TextClassificationSource.
    """

    def __init__(self, df: pd.DataFrame, tokenizer: TextTokenizer,
                 max_length: int = 128, seed: int = 0,
                 seq_buckets: Optional[Sequence[int]] = None):
        self.sampler = PairSampler(df, seed=seed)
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.seq_buckets = bucket_ladder(seq_buckets, max_length)
        self.df = self.sampler.df

    def __len__(self):
        return len(self.df)

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0,
                epoch: int = 0, sampler: Optional[WeightedSampler] = None,
                drop_remainder: bool = True) -> Iterator[Batch]:
        order = _epoch_order(len(self), shuffle, seed, epoch, sampler)
        # per-(seed, epoch) pair stream: a periodic eval pass (shuffle=False,
        # default seed/epoch) must draw the SAME pair set every time —
        # advancing the sampler's persistent RNG across eval windows made
        # eval metrics fluctuate from pair resampling, not model change.
        # Train epochs pass distinct `epoch`, so pairs still resample per
        # epoch like the reference's DataLoader draws.
        rng = np.random.default_rng((seed * 1000 + epoch) * 100003 + 29)
        stop = (len(order) - batch_size + 1) if drop_remainder \
            else len(order)
        for s in range(0, max(stop, 0), batch_size):
            idx = order[s: s + batch_size]
            pairs = [self.sampler.sample_pair(int(i), rng=rng)
                     for i in idx]
            q = self.tokenizer([p[0] for p in pairs], self.max_length)
            t = self.tokenizer([p[1] for p in pairs], self.max_length)
            if self.seq_buckets:
                need = int(max(q["attention_mask"].sum(axis=1).max(),
                               t["attention_mask"].sum(axis=1).max()))
                b = next(x for x in self.seq_buckets if x >= need)
                q = {k: v[:, :b] for k, v in q.items()}
                t = {k: v[:, :b] for k, v in t.items()}
            yield {
                "query_input_ids": q["input_ids"],
                "query_attention_mask": q["attention_mask"],
                "query_token_type_ids": q["token_type_ids"],
                "title_input_ids": t["input_ids"],
                "title_attention_mask": t["attention_mask"],
                "title_token_type_ids": t["token_type_ids"],
                "labels": np.asarray([p[2] for p in pairs], np.int32),
            }
