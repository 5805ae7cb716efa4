"""Custom Spark Python DataSource exposing the deterministic synthetic
transcript corpus as a first-class connector:

    from apt_search_engine_spark.sources.synth import register
    register(spark)
    df = (spark.read.format("aptse_synth")
          .option("convs", 100_000)
          [.option("seed", 42)][.option("numPartitions", 64)]
          .load())

Same rows as corpus.gen_corpus_spark (pinned by test), but as a real
DataSource V2 connector: the planner sees a partitioned, schema-stable
source (one InputPartition per conversation range, each a pure function
of (seed, range)), so `spark.read` users, SQL `CREATE TABLE ... USING`,
and the driver's table-based tooling all work without knowing about the
generator. Rows are produced per-partition on executors — generation
parallelism scales with numPartitions, the driver ships only options.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class ConvRange(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _SynthReader(DataSourceReader):
    def __init__(self, options: dict):
        from apt_search_engine_spark.corpus import SEED

        self.n_convs = int(options.get("convs", 100))
        self.seed = int(options.get("seed", SEED))
        self.n_parts = int(options.get("numpartitions", 8))

    def partitions(self):
        if self.n_convs <= 0:
            # one empty range: convs=0 means an empty frame, not a
            # range()-step-zero crash
            return [ConvRange(0, 0, self.seed)]
        n = max(1, min(self.n_parts, self.n_convs))
        step = -(-self.n_convs // n)  # ceil
        return [
            ConvRange(lo, min(lo + step, self.n_convs), self.seed)
            for lo in range(0, self.n_convs, step)
        ]

    def read(self, part: ConvRange) -> Iterator[tuple]:
        # imported here: this body runs on executors, where the package
        # arrives via --py-files
        from apt_search_engine_spark.corpus import gen_conversation

        for conv_idx in range(part.start, part.end):
            for r in gen_conversation(conv_idx, part.seed):
                yield (
                    r["conv_id"],
                    r["turn_idx"],
                    r["role"],
                    r["text"],
                    r["tool"],
                    r["ts"],
                )


class SyntheticTranscriptsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "aptse_synth"

    def schema(self) -> str:
        return (
            "conv_id string, turn_idx int, role string, "
            "text string, tool string, ts timestamp"
        )

    def reader(self, schema) -> DataSourceReader:
        return _SynthReader({k.lower(): v for k, v in self.options.items()})


def register(spark) -> None:
    """Idempotently register the connector on this session."""
    spark.dataSource.register(SyntheticTranscriptsDataSource)
