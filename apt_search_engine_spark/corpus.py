"""Deterministic synthetic transcripts corpus (FIXTURES.md section T).

Replaces the reference's crawler as the corpus source (SURVEY.md S1): the
input contract is an Iceberg/Parquet table
(conv_id, turn_idx, role, text, tool, ts) per BASELINE.json `input_hint`.

Determinism: every turn's content is a pure function of (seed, conv_idx,
turn_idx) via numpy's seed-sequence RNG, so the corpus is identical no
matter how generation is partitioned across executors. The same generator
backs driver-side pytest fixtures (pandas) and distributed bench corpora
(mapInPandas over a range of conversation ids).

Content is engineered to exercise the engine's edge paths:
  - Zipfian vocabulary (~5k words) with planted head terms -> term skew
    for the salted shuffle;
  - stopwords, digit tokens, 1-char tokens and punctuation -> the T3
    admission filter and Q4/Q5 position quirks;
  - planted adjacent pairs ("travel guide", "europe tips") -> phrase
    queries;
  - the literal words "use"/"user"/"titl" -> heading-substring tag quirks
    (Q3/Q11).
"""

from __future__ import annotations

import datetime as dt
import itertools

import numpy as np
import pandas as pd

SEED = 42
_BASE_TS = dt.datetime(2025, 1, 1)

PLANTED = (
    "travel", "guide", "europe", "tips", "spark", "shuffle", "index",
    "query", "agent", "transcript", "use", "user", "titles", "artful",
    "start", "art",
)

_SYLLABLES = (
    "ba be bi bo bu da de di do du fa fe fi fo fu ga ge gi go gu "
    "ka ke ki ko ku la le li lo lu ma me mi mo mu na ne ni no nu "
    "pa pe pi po pu ra re ri ro ru sa se si so su ta te ti to tu "
    "va ve vi vo vu za ze zi zo zu"
).split()

_STOP_SAMPLE = (
    "the and of to in that was for with his they have this from not are "
    "but had you were all she there been one when who will more about"
).split()

_PUNCT = (".", ",", "!", "?", ";", ":", "'s", '"')

_TOOLS = ("", "bash", "search", "edit", "browse", "python", "fetch")
_ROLES = ("user", "assistant", "system", "tool")


def build_vocab(size: int = 5000) -> list[str]:
    """Fixed synthetic vocabulary: planted head terms first (so Zipf rank
    makes them skewed-hot), then syllable products."""
    vocab = list(PLANTED)
    for n in (2, 3):
        for combo in itertools.product(_SYLLABLES, repeat=n):
            w = "".join(combo)
            vocab.append(w)
            if len(vocab) >= size:
                return vocab
    return vocab


_VOCAB = build_vocab()
_ZIPF_P = 1.0 / np.arange(1, len(_VOCAB) + 1) ** 1.1
_ZIPF_P /= _ZIPF_P.sum()


def gen_conversation(conv_idx: int, seed: int = SEED) -> list[dict]:
    """All turns of one conversation; pure function of (seed, conv_idx)."""
    rng = np.random.default_rng([seed, conv_idx])
    conv_id = f"conv_{conv_idx:06d}"
    n_turns = int(rng.integers(1, 51))
    rows = []
    for turn_idx in range(n_turns):
        r = rng.random()
        if turn_idx == 0 and r < 0.15:
            role = "system"
        elif r < 0.08:
            role = "tool"
        else:
            role = _ROLES[turn_idx % 2]
        tool = _TOOLS[int(rng.integers(1, len(_TOOLS)))] if rng.random() < 0.2 else ""

        n_tokens = int(rng.integers(5, 120))
        kinds = rng.choice(5, size=n_tokens, p=[0.58, 0.22, 0.06, 0.04, 0.10])
        vocab_draws = rng.choice(len(_VOCAB), size=n_tokens, p=_ZIPF_P)
        stop_draws = rng.integers(0, len(_STOP_SAMPLE), size=n_tokens)
        punct_draws = rng.integers(0, len(_PUNCT), size=n_tokens)
        digit_draws = rng.integers(0, 10000, size=n_tokens)
        pair_draws = rng.random(size=n_tokens)

        words: list[str] = []
        for j in range(n_tokens):
            k = kinds[j]
            if k == 0:
                w = _VOCAB[vocab_draws[j]]
                if pair_draws[j] < 0.08:
                    w = w + _PUNCT[punct_draws[j]]
                words.append(w)
            elif k == 1:
                words.append(_STOP_SAMPLE[stop_draws[j]])
            elif k == 2:
                words.append(str(digit_draws[j]))
            elif k == 3:
                words.append("abcdefghij"[int(digit_draws[j]) % 10])
            else:
                # planted adjacent pair for phrase queries
                words.append("travel guide" if pair_draws[j] < 0.5 else "europe tips")
        # occasional empty/whitespace turn exercises T7
        text = "" if rng.random() < 0.01 else " ".join(words)

        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": turn_idx,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": _BASE_TS
                + dt.timedelta(seconds=int(conv_idx) * 3600 + turn_idx * 7),
            }
        )
    return rows


def gen_corpus_pandas(n_convs: int, seed: int = SEED) -> pd.DataFrame:
    rows: list[dict] = []
    for i in range(n_convs):
        rows.extend(gen_conversation(i, seed))
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df


def gen_corpus_spark(spark, n_convs: int, seed: int = SEED, partitions: int | None = None):
    """Distributed generation: each task generates whole conversations, so
    output is identical for any partitioning."""
    from apt_search_engine_spark.schema import TRANSCRIPTS

    def gen(batches):
        for pdf in batches:
            out = []
            for conv_idx in pdf["id"]:
                out.extend(gen_conversation(int(conv_idx), seed))
            if out:
                yield pd.DataFrame(out)

    rng_df = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=TRANSCRIPTS)


def read_transcripts(spark, path: str, fmt: str = "parquet"):
    """Schema-ENFORCED transcript reader for the formats corpora actually
    arrive in: parquet (the native contract), json (JSONL — one turn per
    line, the common interchange for conversation logs), and csv
    (header row, ISO timestamps). The TRANSCRIPTS schema is applied, not
    inferred: at 100 TB schema inference is a full extra scan, and type
    drift between file batches silently corrupts doc identity. Parquet
    is projected+cast to the contract so extra columns and widened types
    from upstream writers cannot leak into the analyzer.

    CSV is read with multiLine quoting (text fields may embed newlines),
    which makes individual files non-splittable — documented trade;
    prefer JSONL or parquet for bulk ingest at scale. CSV cannot natively
    distinguish empty string from NULL, so the contract uses the \\N
    null marker (write with .option("nullValue", "\\\\N") — the reader
    then round-trips both empty strings and NULLs exactly; pinned in
    tests/test_build.py)."""
    from pyspark.sql import functions as F

    from apt_search_engine_spark.schema import TRANSCRIPTS

    fmt = fmt.lower()
    if fmt == "parquet":
        df = spark.read.parquet(path)
        missing = {f.name for f in TRANSCRIPTS} - set(df.columns)
        if missing:
            raise ValueError(f"transcripts at {path} missing columns {sorted(missing)}")
        # fail-loud narrowing: plain cast() under the non-ANSI session
        # silently wraps overflowing ints and NULLs unparseable values —
        # the exact type-drift corruption this reader exists to stop.
        # try_cast + raise_error keeps the check lazy (evaluated in the
        # scan) and is a no-op for columns already at the contract type.
        def _strict(f):
            src, tried = F.col(f.name), F.col(f.name).try_cast(f.dataType)
            return (
                F.when(
                    src.isNotNull() & tried.isNull(),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                f"transcripts at {path}: value not losslessly "
                                f"castable to {f.name} {f.dataType.simpleString()}: "
                            ),
                            src.cast("string"),
                        )
                    ).cast(f.dataType),
                )
                .otherwise(tried)
                .alias(f.name)
            )

        return df.select(*[_strict(f) for f in TRANSCRIPTS])
    if fmt in ("json", "jsonl"):
        return spark.read.schema(TRANSCRIPTS).json(path)
    if fmt == "csv":
        return (
            spark.read.schema(TRANSCRIPTS)
            .option("header", True)
            .option("multiLine", True)
            .option("escape", '"')
            .option("nullValue", "\\N")
            .csv(path)
        )
    raise ValueError(f"unsupported transcripts format {fmt!r}")
