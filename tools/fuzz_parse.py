"""Budgeted fuzz of the ingest parse surface (VERDICT r10 #6).

``parse_records`` (ingest/parse.py) carries the reference's COPY-option
parity — format text/csv/json with configurable delimiter/quote/escape
(pipeline_kinesis.c:224-334) — and its contract is: EVERY input record
either parses into the declared columns or lands in the dead-letter
quarantine with CORRUPT_COL set. Nothing may crash the Spark action,
and no row may vanish (good + quarantined == input).

The decoder fuzzer (tools/fuzz_decoders.py) covers the 9 media codecs;
this tool covers the text-parsing matrix the round-10 verdict flagged
as the remaining corner: random option combos x adversarial payloads
(valid lines, truncations, delimiter/quote collisions, control bytes,
embedded newlines, deep JSON, wrong arity).

Usage:
  python tools/fuzz_parse.py [--budget-s 60] [--seed N]

Emits one JSON summary line; exit 1 on any contract violation.
"""

from __future__ import annotations

import argparse
import json
import string
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

SCHEMAS = (
    "k STRING, v BIGINT",
    "a STRING, b DOUBLE, c BIGINT",
    "x BIGINT, y STRING, z TIMESTAMP",
    "payload STRING",
)

DELIMS = ("\t", ",", ";", "|", "~", "\x01")
QUOTES = (None, '"', "'", "`")
ESCAPES = (None, "\\", '"', "^")

_PRINTABLE = string.ascii_letters + string.digits + " .:-_"


def _field(rng: np.random.Generator, delim: str, quote: str | None) -> str:
    """One payload field — sometimes clean, sometimes hostile."""
    kind = rng.integers(0, 6)
    if kind == 0:
        return str(rng.integers(-(10**12), 10**12))
    if kind == 1:
        n = int(rng.integers(0, 12))
        return "".join(
            _PRINTABLE[i] for i in rng.integers(0, len(_PRINTABLE), n)
        )
    if kind == 2:  # delimiter/quote collision inside the field
        parts = [delim, quote or '"', "\\", "\n", "\r"]
        return "x" + str(parts[int(rng.integers(0, len(parts)))]) + "y"
    if kind == 3:  # control / high bytes
        return bytes(rng.integers(1, 256, 6, dtype=np.uint8)).decode(
            "latin-1"
        )
    if kind == 4:
        return "2024-01-0" + str(rng.integers(1, 10)) + " 10:00:00"
    return ""


def _line(rng: np.random.Generator, schema: str, fmt: str,
          delim: str, quote: str | None) -> str:
    n_declared = schema.count(",") + 1
    kind = rng.integers(0, 5)
    if fmt == "json":
        if kind == 0:  # valid-ish object
            cols = [c.strip().split()[0] for c in schema.split(",")]
            return json.dumps({c: _field(rng, ",", None) for c in cols})
        if kind == 1:  # truncated JSON
            full = json.dumps({"k": "v" * int(rng.integers(0, 30))})
            return full[: int(rng.integers(0, len(full)))]
        if kind == 2:  # deep nesting
            d = int(rng.integers(1, 60))
            return "[" * d + "]" * int(rng.integers(0, d + 1))
        if kind == 3:
            return ""
        return "".join(
            chr(c) for c in rng.integers(32, 127, int(rng.integers(0, 40)))
        )
    # text / csv
    arity = int(rng.integers(0, n_declared + 3))  # wrong arity included
    line = delim.join(_field(rng, delim, quote) for _ in range(arity))
    if kind == 3:  # truncate mid-line
        line = line[: int(rng.integers(0, len(line) + 1))]
    elif kind == 4 and quote:  # unbalanced quote
        line = quote + line
    return line


def run_budget(seed: int, budget_s: float) -> int:
    from pyspark.sql import functions as F

    from pipeline_kinesis_spark import get_spark
    from pipeline_kinesis_spark.ingest.parse import (
        CORRUPT_COL,
        parse_records,
        split_quarantine,
    )
    from pipeline_kinesis_spark.sources.records import RECORD_SCHEMA

    spark = get_spark("fuzz-parse", shuffle_partitions=8)
    rng = np.random.default_rng(seed)
    t0 = time.monotonic()
    combos = 0
    rows_total = 0
    violations: list[str] = []
    while time.monotonic() - t0 < budget_s:
        fmt = ("text", "csv", "json")[int(rng.integers(0, 3))]
        schema = SCHEMAS[int(rng.integers(0, len(SCHEMAS)))]
        delim = DELIMS[int(rng.integers(0, len(DELIMS)))]
        quote = QUOTES[int(rng.integers(0, len(QUOTES)))]
        escape = ESCAPES[int(rng.integers(0, len(ESCAPES)))]
        n = 400
        lines = [_line(rng, schema, fmt, delim, quote) for _ in range(n)]
        records = spark.createDataFrame(
            [(ln, f"{i:04d}", "pk", None, "shardId-0")
             for i, ln in enumerate(lines)],
            RECORD_SCHEMA,
        )
        label = f"fmt={fmt} delim={delim!r} quote={quote!r} esc={escape!r}"
        try:
            parsed = parse_records(
                records, schema, fmt=fmt, delimiter=delim,
                quote=quote, escape=escape,
            )
            good, bad = split_quarantine(parsed)
            n_good, n_bad = good.count(), bad.count()
            if n_good + n_bad != n:
                violations.append(
                    f"{label}: {n_good}+{n_bad} != {n} rows (lost rows)"
                )
            # quarantined rows must preserve the original payload
            kept = bad.filter(F.col(CORRUPT_COL).isNull()).count()
            if kept:
                violations.append(
                    f"{label}: {kept} quarantined rows lost CORRUPT_COL"
                )
        except Exception as exc:  # noqa: BLE001 — the contract ban
            violations.append(
                f"{label}: {type(exc).__name__}: {str(exc)[:200]}"
            )
        combos += 1
        rows_total += n
        if violations:
            break
    print(
        json.dumps(
            {
                "metric": "parse_fuzz_budget",
                "combos": combos,
                "rows": rows_total,
                "violations": len(violations),
                "seed": seed,
                "budget_s": budget_s,
                "detail": violations[:5],
            }
        ),
        flush=True,
    )
    return 1 if violations else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()
    return run_budget(args.seed, args.budget_s)


if __name__ == "__main__":
    sys.exit(main())
