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


class _ExplodeTypedRecords:
    """POLYMORPHIC UDTF (Spark 4 analyze-time schema): explode a JSON
    object string into ONE typed row whose schema is derived from a
    constant field-spec argument — ``explode_typed_records('k:bigint,
    tag:string', payload)`` plans a (k bigint, tag string) output
    without any registration-time returnType. ``analyze`` runs ONCE at
    query planning with the constant spec (a non-constant spec is a
    planning error, surfaced by Spark itself), so every downstream
    operator — pruning, filters, aggregates — sees real typed columns;
    ``eval`` then only coerces values at runtime. Missing keys yield
    typed NULLs, malformed JSON yields no row (the tolerant-reader
    contract, same as sources.tolerant_json). This is the generic
    schema-on-read escape hatch a fixed-schema UDTF can't be: one
    registration serves every payload layout in the lake."""

    _TYPES = {"int", "bigint", "double", "string", "boolean"}

    @staticmethod
    def _parse_spec(spec: str) -> list[tuple[str, str]]:
        fields = []
        for part in spec.split(","):
            name, _, ty = part.partition(":")
            name, ty = name.strip(), ty.strip()
            if not name or ty not in _ExplodeTypedRecords._TYPES:
                raise ValueError(
                    f"explode_typed_records spec field {part!r}: want "
                    f"'name:type' with type in {sorted(_ExplodeTypedRecords._TYPES)}"
                )
            fields.append((name, ty))
        return fields

    @staticmethod
    def analyze(spec, payload):  # noqa: ANN001 — AnalyzeArgument at runtime
        from pyspark.sql.types import (
            BooleanType,
            DoubleType,
            IntegerType,
            LongType,
            StringType,
            StructType,
        )
        from pyspark.sql.udtf import AnalyzeResult

        if not isinstance(spec.value, str):
            raise ValueError("explode_typed_records: spec must be a constant string")
        mk = {
            "int": IntegerType,
            "bigint": LongType,
            "double": DoubleType,
            "string": StringType,
            "boolean": BooleanType,
        }
        st = StructType()
        for name, ty in _ExplodeTypedRecords._parse_spec(spec.value):
            st = st.add(name, mk[ty]())
        return AnalyzeResult(schema=st)

    @staticmethod
    def _coercers(fields):
        """One closure per field, bound once at memo time: the
        per-row type-dispatch ladder (string compares + isinstance
        branches per field per row) becomes a direct call — eval runs
        once per INPUT ROW even under Arrow transport, so shaving
        per-row Python work is the only remaining §4 lever here."""
        import json

        def _int(v):
            return int(v) if type(v) is int or type(v) is float else None

        def _dbl(v):
            return float(v) if type(v) is int or type(v) is float else None

        def _bool(v):
            return v if type(v) is bool else None

        def _str(v):
            return v if type(v) is str else (None if v is None else json.dumps(v))

        mk = {"int": _int, "bigint": _int, "double": _dbl, "boolean": _bool, "string": _str}
        return [(name, mk[ty]) for name, ty in fields]

    def eval(self, spec: str, payload: str):
        import json

        # the spec is a planning-time constant but eval receives it
        # per ROW — memoize the parse (measured: the split/strip chain
        # per row was ~1/3 of the UDTF's sf0.1 wall)
        # payload-None short-circuits BEFORE the spec parse: a row with
        # a null payload must yield nothing even if its spec cell is
        # null/invalid (the memo lookup alone would be safe, but a
        # cold-cache parse of a bad spec would raise)
        if payload is None:
            return
        coercers = getattr(self, "_memo_coercers", None)
        if coercers is None or getattr(self, "_memo_spec", None) != spec:
            coercers = self._coercers(self._parse_spec(spec))
            self._memo_spec, self._memo_coercers = spec, coercers
        try:
            rec = json.loads(payload)
        except ValueError:
            return
        if not isinstance(rec, dict):
            return
        get = rec.get
        yield tuple(c(get(name)) for name, c in coercers)


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


def _make_polymorphic(cls):
    """No returnType — the class's ``analyze`` supplies the schema at
    planning time. Arrow-optimized when the runtime supports it."""
    try:
        return udtf(cls, useArrow=True)
    except TypeError:  # older signature without useArrow
        return udtf(cls)


ExplodeTypedRecords = _make_polymorphic(_ExplodeTypedRecords)


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF library for SQL use (idempotent).

    After this, SQL queries can LATERAL-join them::

        SELECT d.doc_id, t.pos, t.token
        FROM documents d, LATERAL tokenize_pos(d.text) t
    """
    spark.udtf.register("tokenize_pos", TokenizePos)
    spark.udtf.register("char_ngrams", CharNgrams)
    spark.udtf.register("explode_typed_records", ExplodeTypedRecords)
