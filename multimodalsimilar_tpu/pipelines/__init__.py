from multimodalsimilar_tpu.pipelines.sinks import (
    InMemoryKVSink, InMemoryTableSink, KVSink, ParquetTableSink, RedisKVSink,
    TableSink)
