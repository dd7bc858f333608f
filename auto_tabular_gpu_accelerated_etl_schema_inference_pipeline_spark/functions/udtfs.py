"""Python UDTFs (table functions) — the one-row-in/many-rows-out user
extension point (Spark 4 `@udtf`). No ``from __future__ import
annotations`` here, matching udf_kernels.py: decorator-evaluated
signatures stay real.

The reference's only custom compute is a scalar kernel
(/root/reference/etl_benchmark_numba.py:39-50); UDTFs cover the
generator-shaped custom ops a training-data pipeline needs (shingling,
chunking, record exploding) when the logic outgrows `explode(transform(
...))` built-ins. These run per-row in a Python worker — fine for
generator logic; heavy numeric work belongs in the Arrow kernels.
"""

from pyspark.sql.functions import udtf


@udtf(returnType="ngram: string")
class BigramUDTF:
    """Emit one row per consecutive token pair (word bigram) of the
    input text — the shingling primitive behind n-gram LM stats and
    BPE-style vocabulary induction. Equivalent declarative form:
    explode(transform(...)) over split(); the UDTF form is the API
    surface demo and the extension point for stateful/streaming
    shingling (overlap across chunk boundaries) that the declarative
    form can't express."""

    def eval(self, text):
        if not text:
            return
        toks = text.split(" ")
        for i in range(len(toks) - 1):
            yield (toks[i] + " " + toks[i + 1],)


class NgramUDTF:
    """POLYMORPHIC UDTF (Spark 4 static ``analyze``): emits order-n
    n-grams with 1-based positions, where the OUTPUT SCHEMA is computed
    from the constant ``n`` argument at plan time — the column is named
    ``ngram<n>``. This is the schema-from-arguments half of the UDTF
    contract that a fixed ``returnType`` (BigramUDTF above) cannot
    express; pipelines use it for width-parameterized exploders
    (n-grams, fixed-stride chunkers) without one class per width."""

    @staticmethod
    def analyze(text, n):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.types import (
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        order = int(n.value)
        return AnalyzeResult(
            StructType(
                [
                    StructField(f"ngram{order}", StringType()),
                    StructField("pos", IntegerType()),
                ]
            )
        )

    def eval(self, text, n):
        if not text:
            return
        toks = text.split(" ")
        for i in range(len(toks) - int(n) + 1):
            yield " ".join(toks[i : i + int(n)]), i + 1
