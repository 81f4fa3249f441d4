"""One-shot codemod: wrap integer-typed ``sum(...) AS alias`` in oracle SQL
with an outer ``CAST(... AS BIGINT)``.

DuckDB types sum(BIGINT) as HUGEINT, whose pandas conversion is float64;
the driver's astype(str) canon then sees "123.0" != "123" against Spark's
int64.  Only sums whose result is directly exposed as an output column
(followed by ``AS``) need the wrap.
"""

from __future__ import annotations

import re
import sys

FILES = [
    "pipeline_kinesis_spark/operators/tpch.py",
    "pipeline_kinesis_spark/operators/relational.py",
    "pipeline_kinesis_spark/operators/timeseries.py",
    "pipeline_kinesis_spark/operators/dedup.py",
    "pipeline_kinesis_spark/operators/textops.py",
    "pipeline_kinesis_spark/operators/similarity.py",
    "pipeline_kinesis_spark/operators/sketches.py",
    "pipeline_kinesis_spark/operators/multimodal.py",
    "pipeline_kinesis_spark/operators/pandas_udfs.py",
]


def integer_sum(inner: str) -> bool:
    if "AS BIGINT" in inner:
        return True
    return bool(re.search(r"THEN\s+1\s+ELSE\s+0", inner))


def process(text: str) -> tuple[str, int]:
    edits = []
    for m in re.finditer(r"(?<![\w.])sum\(", text):
        start = m.start()
        i = m.end()
        depth = 1
        while depth and i < len(text):
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        if depth:
            continue
        inner = text[m.end() : i - 1]
        j = i
        while j < len(text) and text[j] in " \t\n":
            j += 1
        if not text.startswith("AS ", j):
            continue
        if not integer_sum(inner):
            continue
        # already wrapped?
        before = text[max(0, start - 6) : start]
        if before.endswith("CAST("):
            continue
        edits.append((start, i))
    for start, i in reversed(edits):
        text = text[:start] + "CAST(" + text[start:i] + " AS BIGINT)" + text[i:]
    return text, len(edits)


def main() -> None:
    total = 0
    for path in FILES:
        with open(path) as f:
            text = f.read()
        new, n = process(text)
        if n:
            with open(path, "w") as f:
                f.write(new)
        print(f"{path}: {n} sums wrapped")
        total += n
    print(f"total: {total}")


if __name__ == "__main__":
    sys.exit(main())
