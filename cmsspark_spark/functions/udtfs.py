"""Python UDTFs (Spark 3.5+/4.x table functions) — the D3 surface in
its modern form.

The reference's 1→N expansions are RDD flatMaps over parsed records
(wmarchive.py:108-154 emits one dict per cmsRun step;
cmssw_avro2json.py maps one record to many docs). The engine's PRIMARY
answer stays ``explode``/``posexplode`` over array columns (pure
Catalyst, see operators/nested.py and `stepchain_cpu_eff`) — a Python
UDTF pays a Python-worker round trip per row and should only carry
logic arrays can't express. These wrappers exist to cover the API
surface (registration, LATERAL join, SQL invocation) and are tested
equivalent to their explode twins.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, token: string")
class TokenizeUDTF:
    """One row per whitespace token with its position — the UDTF twin
    of ``posexplode(split(text, '\\\\s+'))``. Empty tokens are skipped
    (same semantics as the tokens() column helper)."""

    def eval(self, text: str):
        if text is None:
            return
        pos = 0
        for tok in text.split():
            yield pos, tok
            pos += 1


@udtf(returnType="step_idx: int, site: string, cpu: double")
class StepsUDTF:
    """One row per step struct — the wmarchive flatMap shape
    (wmarchive.py:108-154) as a table function. Input is the packed
    steps array (list of Rows/dicts with site/cpu)."""

    def eval(self, steps):
        if steps is None:
            return
        for i, s in enumerate(steps):
            get = s.asDict().get if hasattr(s, "asDict") else s.get
            yield i, get("site"), get("cpu")


def register_udtfs(spark) -> None:
    """Make the table functions callable from SQL:
    ``SELECT t.* FROM docs, LATERAL tokenize(text) t``."""
    spark.udtf.register("tokenize", TokenizeUDTF)
    spark.udtf.register("explode_steps", StepsUDTF)
