"""Python UDTFs (Spark 4) — the table-function form of the reference's
FlatMapFunction surface (1 row -> N rows, SURVEY §2.12):
chapter5/BasicTransformations.scala:91-95 (`SplitIdFlatMap`).

The JVM fast path for this exact operator is explode(split(...)) —
registered as `flatmap_split_tokens` — and stays the default; the UDTF
is the *general* user-defined 1->N surface for logic a builtin can't
express (the reference's open-ended FlatMapFunction contract). Arrow
transfer (`useArrow=True`) keeps the JVM<->Python hop batched.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token: string", useArrow=True)
class SplitTokens:
    """'sensor_7' -> ('sensor',), ('7',) — one output row per token."""

    def eval(self, ident: str):
        if ident is None:
            return
        for tok in ident.split("_"):
            yield (tok,)


def register_udtfs(spark) -> None:
    spark.udtf.register("split_tokens", SplitTokens)
