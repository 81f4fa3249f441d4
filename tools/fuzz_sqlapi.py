"""Budgeted fuzz of the SQL-statement control surface (VERDICT r11 #4).

``sqlapi.execute`` parses the reference's entire ops grammar — control-
plane calls, stream/view/transform DDL with the WITH-option matrix
(which grew watermark/watermark_column in r11), ACTIVATE/DEACTIVATE,
and psql-script splitting. Its contract: every statement either
executes (possibly falling through to ``engine.sql`` for ad-hoc reads)
or raises the module's clean ``ValueError`` — never an unhandled
TypeError/IndexError/AttributeError/re.error, and never a
silently-wrong kwargs dict handed to the engine.

Three fuzz tracks, mirroring tools/fuzz_parse.py's budget shape:

1. MUTATION: valid statements from every template, mangled
   (truncation, stray quotes/parens/semicolons, keyword-colliding
   names, doubled tokens, whitespace/newline injection) — only
   ValueError may escape.
2. GARBAGE: random printable/control-byte lines — same ban.
3. PROPERTY: un-mangled statements with randomized known argument
   values run against a recording fake engine; the recorded call must
   equal the closed-form expectation (catches silently-wrong parses,
   e.g. a WITH option landing under the wrong kwarg).

Usage:
  python tools/fuzz_sqlapi.py [--budget-s 60] [--seed N]

Emits one JSON summary line; exit 1 on any contract violation.
No Spark session is needed — the surface under test is pure parsing.
"""

from __future__ import annotations

import argparse
import json
import string
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from pipeline_kinesis_spark import sqlapi  # noqa: E402


class _Recorder:
    """Fake engine: accepts every control-plane call and records it.

    ``sqlapi`` owns only the PARSE; anything the engine would reject
    (unknown stream, bad schema) is the engine's domain, so the fake
    accepts everything and the fuzz contract is purely about the
    parser's error discipline + argument fidelity.
    """

    def __init__(self) -> None:
        self.calls: list[tuple[str, tuple, dict]] = []
        self._procs: dict = {}
        self.catalog = self

    # catalog shim: every identifier is a known source relation, so
    # _infer_stream never rejects a syntactically-valid FROM
    def _is_source_relation(self, rel: str) -> bool:
        return True

    def __getattr__(self, name: str):
        def record(*args, **kwargs):
            self.calls.append((name, args, kwargs))
            return "ok" if name != "ttl_expire" else 0

        return record


_IDENT = string.ascii_lowercase + "_"
_KEYWORDY = ("select", "stream", "view", "from", "with", "as", "null",
             "true", "activate", "continuous", "transform", "drop")


def _ident(rng: np.random.Generator) -> str:
    if rng.integers(0, 4) == 0:
        return str(rng.choice(_KEYWORDY))  # keyword-colliding name
    n = int(rng.integers(1, 12))
    return "".join(_IDENT[i] for i in rng.integers(0, len(_IDENT), n))


def _str_lit(rng: np.random.Generator) -> str:
    n = int(rng.integers(0, 10))
    body = "".join(
        (string.ascii_letters + string.digits + " ,.':();\\")[i]
        for i in rng.integers(0, 70, n)
    ).replace("'", "''")
    return f"'{body}'"


def _valid_statement(rng: np.random.Generator) -> str:
    k = int(rng.integers(0, 13))
    name, other = _ident(rng), _ident(rng)
    if k == 0:
        return (f"SELECT pipeline_kinesis.add_endpoint('{name}', "
                f"'us-east-1', NULL, {_str_lit(rng)})")
    if k == 1:
        return f"SELECT pipeline_kinesis.remove_endpoint('{name}')"
    if k == 2:
        return (f"SELECT pipeline_kinesis.consume_begin('{name}', "
                f"'{other}', 'rel', format := 'csv', delimiter := ',', "
                f"batchsize := {int(rng.integers(1, 5000))}, "
                f"start_seq := {int(rng.choice([-2, -1]))})")
    if k == 3:
        return f"SELECT pipeline_kinesis.consume_end('{name}', '{other}', 'r')"
    if k == 4:
        return (f"CREATE STREAM {name} (a text, b bigint, c float8, "
                f"d numeric(10,2), e timestamptz)")
    if k == 5:
        return (f"CREATE CONTINUOUS VIEW {name} WITH (ttl='7 days', "
                f"ttl_column='ts', materialize='parquet_upsert', "
                f"key_cols='a,b', upsert_buckets=8) AS SELECT a, "
                f"count(*) AS n FROM {other} GROUP BY a")
    if k == 6:
        return (f"CREATE CONTINUOUS VIEW {name} WITH (sw='1 hour', "
                f"sw_step='3 minutes', watermark='10 minutes', "
                f"watermark_column='ts', output_mode='append', "
                f"osrel_keep_batches=unbounded) AS SELECT ts, "
                f"sum(v) AS s FROM {other} GROUP BY ts")
    if k == 7:
        return (f"CREATE CONTINUOUS TRANSFORM {name} AS "
                f"SELECT x, y FROM output_of('{other}')")
    if k == 8:
        return f"ALTER STREAM {name} ADD COLUMN c{other[:4]} varchar(255)"
    if k == 9:
        kind = rng.choice(["CONTINUOUS VIEW", "CONTINUOUS TRANSFORM",
                           "STREAM"])
        return f"DROP {kind} {name}"
    if k == 10:
        verb = rng.choice(["ACTIVATE", "DEACTIVATE"])
        return f"{verb} {name}"
    if k == 11:
        return (f"SELECT pipeline_rebucket('{name}', "
                f"{int(rng.integers(1, 64))})")
    return (f"SELECT pipeline_kinesis.replay_dead_letters('{name}', "
            f"delimiter := ',', schema_ddl => 'a text, b bigint')")


def _mangle(rng: np.random.Generator, stmt: str) -> str:
    k = int(rng.integers(0, 8))
    if k == 0 and stmt:  # truncate
        return stmt[: int(rng.integers(0, len(stmt)))]
    if k == 1:  # stray quote at a random position
        i = int(rng.integers(0, len(stmt) + 1))
        return stmt[:i] + "'" + stmt[i:]
    if k == 2:  # unbalanced paren
        i = int(rng.integers(0, len(stmt) + 1))
        return stmt[:i] + rng.choice(["(", ")"]) + stmt[i:]
    if k == 3:  # stray semicolons
        return stmt.replace(" ", "; ", 1) + ";;"
    if k == 4:  # double a token
        toks = stmt.split(" ")
        i = int(rng.integers(0, len(toks)))
        toks.insert(i, toks[i])
        return " ".join(toks)
    if k == 5:  # newline/whitespace injection
        i = int(rng.integers(0, len(stmt) + 1))
        return stmt[:i] + "\n\t " + stmt[i:]
    if k == 6:  # random case flip
        return "".join(
            c.swapcase() if rng.integers(0, 3) == 0 else c for c in stmt
        )
    # splice two statements without a separator
    return stmt + " " + _valid_statement(rng)


def _garbage(rng: np.random.Generator) -> str:
    n = int(rng.integers(0, 120))
    return bytes(rng.integers(1, 127, n, dtype=np.uint8)).decode("ascii")


# -- property track: exact expected engine calls -----------------------------


def _check_properties(rng: np.random.Generator) -> list[str]:
    bad: list[str] = []

    def run(stmt: str) -> _Recorder:
        eng = _Recorder()
        sqlapi.execute(eng, stmt)
        return eng

    # consume_begin argument fidelity (positional + named mix)
    bs = int(rng.integers(1, 10**6))
    par = int(rng.integers(1, 64))
    start = int(rng.choice([-2, -1]))
    eng = run(
        "SELECT pipeline_kinesis.consume_begin('ep', 'st', 'rel', "
        f"'csv', delimiter := '|', quote := '\"', escape := '\\', "
        f"batchsize := {bs}, parallelism := {par}, start_seq := {start})"
    )
    fn, args, kw = eng.calls[-1]
    want_pos = ("ep", "st", "rel")
    want_kw = {
        "fmt": "csv", "delimiter": "|", "quote": '"', "escape": "\\",
        "batchsize": bs, "parallelism": par,
        "start_position": "trim_horizon" if start == -2 else "latest",
    }
    if fn != "consume_begin" or args != want_pos or kw != want_kw:
        bad.append(f"consume_begin parsed to {fn} {args} {kw}")

    # WITH-option mapping fidelity (durations, ints, lists, opt-outs)
    ttl_n = int(rng.integers(1, 400))
    sw_n = int(rng.integers(1, 48))
    wm_n = int(rng.integers(1, 120))
    buckets = int(rng.integers(1, 512))
    eng = run(
        f"CREATE CONTINUOUS VIEW pv WITH (ttl='{ttl_n} minutes', "
        f"ttl_column='ts', sw='{sw_n} hours', sw_step='5 minutes', "
        f"watermark='{wm_n} seconds', watermark_column='evt', "
        f"materialize='parquet_upsert', key_cols='a, b', "
        f"upsert_buckets={buckets}, osrel_keep_batches=none, "
        f"output_mode='append') AS SELECT a, b FROM src"
    )
    fn, args, kw = eng.calls[-1]
    want_kw = {
        "ttl_seconds": ttl_n * 60, "ttl_column": "ts",
        "sw_seconds": sw_n * 3600, "sw_step_seconds": 300,
        "watermark_delay_seconds": wm_n, "watermark_column": "evt",
        "materialize": "parquet_upsert", "key_cols": ["a", "b"],
        "upsert_buckets": buckets, "osrel_keep_batches": None,
        "output_mode": "append",
    }
    if fn != "create_continuous_view" or args[:1] != ("pv",) or kw != want_kw:
        bad.append(f"create_cv parsed to {fn} {args} {kw}")

    # replay_dead_letters argument fidelity: PG column types in the
    # schema_ddl override map exactly like CREATE STREAM (r15, the
    # SQL spelling of the r14 pre-ALTER recovery override)
    eng = run(
        "SELECT pipeline_kinesis.replay_dead_letters('rel', "
        "format := 'csv', delimiter := '|', "
        "schema_ddl => 'v bigint, k text')"
    )
    fn, args, kw = eng.calls[-1]
    want_kw = {
        "fmt": "csv", "delimiter": "|", "quote": None, "escape": None,
        "schema_ddl": "v BIGINT, k STRING",
    }
    if fn != "replay_dead_letters" or args != ("rel",) or kw != want_kw:
        bad.append(f"replay_dead_letters parsed to {fn} {args} {kw}")

    # script splitting: semicolons inside literals and comments survive
    script = (
        "-- header comment; with semicolon\n"
        "CREATE STREAM s (a text); -- trailing; comment\n"
        "SELECT pipeline_kinesis.add_endpoint('e', 'r', NULL, "
        "'http://h;port'); ACTIVATE v"
    )
    stmts = sqlapi.split_statements(script)
    if len(stmts) != 3 or "h;port" not in stmts[1]:
        bad.append(f"split_statements -> {stmts}")
    return bad


def run_budget(seed: int, budget_s: float) -> int:
    rng = np.random.default_rng(seed)
    t0 = time.monotonic()
    n_stmts = 0
    violations: list[str] = []

    while time.monotonic() - t0 < budget_s and not violations:
        violations.extend(_check_properties(rng))
        for _ in range(200):
            track = int(rng.integers(0, 3))
            if track == 0:
                stmt = _mangle(rng, _valid_statement(rng))
            elif track == 1:
                stmt = _garbage(rng)
            else:
                stmt = _valid_statement(rng)
            try:
                sqlapi.execute(_Recorder(), stmt)
            except ValueError:
                pass  # the module's clean rejection
            except Exception as exc:  # noqa: BLE001 — the contract ban
                violations.append(
                    f"{type(exc).__name__}: {str(exc)[:120]} "
                    f"<- {stmt[:160]!r}"
                )
                break
            # script splitter must never raise at all
            try:
                sqlapi.split_statements(stmt + ";" + stmt)
            except Exception as exc:  # noqa: BLE001
                violations.append(
                    f"split_statements {type(exc).__name__} "
                    f"<- {stmt[:160]!r}"
                )
                break
            n_stmts += 1

    print(
        json.dumps(
            {
                "metric": "sqlapi_fuzz_budget",
                "statements": n_stmts,
                "violations": len(violations),
                "seed": seed,
                "budget_s": budget_s,
                "wall_s": round(time.monotonic() - t0, 1),
                "detail": violations[:5],
            }
        ),
        flush=True,
    )
    return 1 if violations else 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=60.0)
    ap.add_argument("--seed", type=int, default=12)
    args = ap.parse_args()
    return run_budget(args.seed, args.budget_s)


if __name__ == "__main__":
    sys.exit(main())
