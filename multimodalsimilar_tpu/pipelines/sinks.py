"""Serving/warehouse sinks behind thin interfaces with in-memory fakes.

The reference writes straight to production infra — Redis SET+EXPIRE
pipelines (nlp_infer.py:154-172) and Hive tmp-table + INSERT OVERWRITE via
Spark (goodssku_emb_bert_di.py:148-154). Here the same contracts are
interfaces so every pipeline is testable hermetically:

* KVSink — pipelined set-with-TTL key/value writes (online serving store).
  RedisKVSink adapts a real redis client when the ``redis`` package and a
  server exist; InMemoryKVSink is the fake.
* TableSink — append/overwrite of key->row tables (embedding warehouse).
  ParquetTableSink stands in for Hive (a dt-partitioned parquet dir);
  InMemoryTableSink is the fake.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Mapping, Optional, Tuple

import pandas as pd


class KVSink:
    def set_many(self, items: Mapping[str, str],
                 ttl_seconds: Optional[int] = None) -> None:
        raise NotImplementedError

    def get(self, key: str) -> Optional[str]:
        raise NotImplementedError


class InMemoryKVSink(KVSink):
    """Fake Redis: stores (value, expiry-timestamp)."""

    def __init__(self):
        self.data: Dict[str, Tuple[str, Optional[float]]] = {}

    def set_many(self, items, ttl_seconds=None):
        exp = time.time() + ttl_seconds if ttl_seconds else None
        for k, v in items.items():
            self.data[k] = (str(v), exp)

    def get(self, key):
        item = self.data.get(key)
        if item is None:
            return None
        value, exp = item
        if exp is not None and time.time() > exp:
            del self.data[key]
            return None
        return value

    def ttl(self, key) -> Optional[float]:
        item = self.data.get(key)
        return None if item is None or item[1] is None else \
            item[1] - time.time()

    def keys(self) -> List[str]:
        return list(self.data)


class RedisKVSink(KVSink):
    """Real Redis adapter, written like copy_redis.py/nlp_infer.py use it:
    chunked pipelines of SET + EXPIRE (chunk 1000, copy_redis.py:22-35)."""

    def __init__(self, host: str, port: int = 6379, db: int = 0,
                 password: Optional[str] = None, chunk: int = 1000):
        import redis  # optional dependency; import deferred
        self.client = redis.StrictRedis(host=host, port=port, db=db,
                                        password=password)
        self.chunk = chunk

    def set_many(self, items, ttl_seconds=None):
        pipe = self.client.pipeline(transaction=False)
        for i, (k, v) in enumerate(items.items(), 1):
            if ttl_seconds:
                pipe.setex(k, int(ttl_seconds), v)
            else:
                pipe.set(k, v)
            if i % self.chunk == 0:
                pipe.execute()
        pipe.execute()

    def get(self, key):
        v = self.client.get(key)
        return v.decode() if isinstance(v, bytes) else v


class TableSink:
    def existing_keys(self, key_col: str) -> set:
        raise NotImplementedError

    def append(self, df: pd.DataFrame) -> None:
        raise NotImplementedError

    def overwrite(self, df: pd.DataFrame) -> None:
        raise NotImplementedError

    def read(self) -> pd.DataFrame:
        raise NotImplementedError


class InMemoryTableSink(TableSink):
    def __init__(self):
        self._df = pd.DataFrame()

    def existing_keys(self, key_col):
        return set() if self._df.empty else set(self._df[key_col])

    def append(self, df):
        self._df = pd.concat([self._df, df], ignore_index=True)

    def overwrite(self, df):
        self._df = df.reset_index(drop=True)

    def read(self):
        return self._df.copy()


class ParquetTableSink(TableSink):
    """Hive-table stand-in: a parquet file per table. ``overwrite`` mimics
    the reference's tmp-table + INSERT OVERWRITE (atomic replace via
    rename)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def existing_keys(self, key_col):
        if not os.path.exists(self.path):
            return set()
        return set(pd.read_parquet(self.path, columns=[key_col])[key_col])

    def read(self):
        if not os.path.exists(self.path):
            return pd.DataFrame()
        return pd.read_parquet(self.path)

    def append(self, df):
        combined = pd.concat([self.read(), df], ignore_index=True)
        self.overwrite(combined)

    def overwrite(self, df):
        tmp = self.path + ".tmp"
        df.reset_index(drop=True).to_parquet(tmp)
        os.replace(tmp, self.path)
