"""Python UDTF surface (1 row -> N rows user table functions).

The reference's entire user API is three shipped functions, and its
``mapfn`` is exactly a UDTF: one input record yields any number of
output records (`/root/reference/kaylee/client.py:190-202` consumes it
with a nested emit loop). The MapReduce contract in
``kaylee_spark/core/mapreduce.py`` already reproduces those semantics
on RDDs; this module exposes the same 1->N shape as a FIRST-CLASS SQL
citizen — ``@udtf`` classes registered with ``spark.udtf.register`` and
invoked via ``LATERAL`` joins — completing the UDF/UDAF/UDTF triple
(scalar pandas_udf / grouped-agg pandas_udf / udtf).

Performance discipline (same rule as functions/pandas_udfs.py): a
Python UDTF is the SLOW PATH — rows cross the JVM/Python boundary.
When Arrow is available the UDTFs here are registered Arrow-optimized
(batched columnar transfer, ~10x less serialization overhead); but for
anything expressible as built-ins, prefer the codegen'd equivalent —
``posexplode(split(...))`` computes tokenize_pos entirely JVM-side and
is what the hot-path operators (operators/text.py) actually use. The
UDTF earns its keep when per-row logic is genuinely imperative
(stateful scanners, external-library parsers, decoders).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


class _TokenizePos:
    """Whitespace tokenizer with positions: text -> (pos, token, n_chars).

    The UDTF twin of ``posexplode(split(text, ' '))`` (which should be
    preferred in hot paths — see module doc). Empty tokens from runs of
    separators are skipped, matching the built-in filter in
    operators/text.py token counting.
    """

    def eval(self, text: str):
        if text is None:
            return
        pos = 0
        for tok in text.split(" "):
            if tok:
                yield (pos, tok, len(tok))
                pos += 1


class _CharNgrams:
    """Character shingles: (text, n) -> (pos, gram). The imperative
    twin of the shingling expression in operators/dedup.py
    ``hashed_shingles`` — emitted as a UDTF so SQL users can LATERAL
    over it for ad-hoc inspection of what the dedup pipeline hashes."""

    def eval(self, text: str, n: int):
        if text is None or n is None or n <= 0:
            return
        for i in range(max(len(text) - n + 1, 1) if text else 0):
            yield (i, text[i : i + n])


_TOKENIZE_SCHEMA = "pos: int, token: string, n_chars: int"
_NGRAM_SCHEMA = "pos: int, gram: string"


def _make(cls, schema: str):
    """Arrow-optimized when the runtime supports it (Spark 4 +
    pyarrow), plain pickled-row transfer otherwise."""
    try:
        return udtf(cls, returnType=schema, useArrow=True)
    except TypeError:  # older signature without useArrow
        return udtf(cls, returnType=schema)


TokenizePos = _make(_TokenizePos, _TOKENIZE_SCHEMA)
CharNgrams = _make(_CharNgrams, _NGRAM_SCHEMA)


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF library for SQL use (idempotent).

    After this, SQL queries can LATERAL-join them::

        SELECT d.doc_id, t.pos, t.token
        FROM documents d, LATERAL tokenize_pos(d.text) t
    """
    spark.udtf.register("tokenize_pos", TokenizePos)
    spark.udtf.register("char_ngrams", CharNgrams)
