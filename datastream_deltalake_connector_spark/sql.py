"""SQL control plane for icepack tables — the Delta-style statement surface.

The reference connector runs on Databricks, where its users reach the table
through SQL: ``MERGE INTO`` for upserts, ``OPTIMIZE ... ZORDER BY`` and
``VACUUM`` for maintenance, ``DELETE``/``UPDATE`` for ad-hoc DML,
``DESCRIBE HISTORY`` / ``RESTORE`` / ``VERSION AS OF`` for the version
surface (README.md:103-113 time-travel notes). This module is that surface
for the native engine: one ``execute()`` entry point that parses a bounded,
documented dialect and routes each statement to the operator that already
implements it — parsing here, execution in the operators, never a second
execution path that could drift.

``SELECT`` is NOT reimplemented: table references (with optional
``VERSION AS OF`` / ``TIMESTAMP AS OF``) are rewritten to temp views over
pinned ``scan()`` DataFrames and the text is handed to ``spark.sql`` — the
full Catalyst SQL engine with manifest pruning underneath, zero new
semantics.

Dialect (case-insensitive keywords; single-quoted strings; ``--`` comments):

    SELECT / WITH ...                 any Spark SQL; icepack refs may carry
                                      VERSION AS OF <n>|'<ref>' or
                                      TIMESTAMP AS OF '<iso>' (UTC);
                                      inspection refs t.history / t.files /
                                      t.partitions (Iceberg metadata
                                      tables); table_changes('t', from[,to])
                                      (Delta CDF table-valued function)
    CREATE TABLE [IF NOT EXISTS] t (col TYPE, ...)
        [PARTITIONED BY (spec, ...)]  spec: col | day(col) | bucket(n, col)
        [AS SELECT ...]               | truncate(n, col); CTAS infers the
                                      schema from the query when the column
                                      list is omitted
    DROP TABLE [IF EXISTS] t
    INSERT INTO t [(cols)] VALUES (...), (...) | SELECT ...
    INSERT OVERWRITE t SELECT ...
    DELETE FROM t WHERE pred          prunable conjuncts are lifted to
    UPDATE t SET c = e, ... WHERE pred    manifest filters automatically
    MERGE [WITH SCHEMA EVOLUTION] INTO t [AS] a
        USING (src|(SELECT ...)) [AS] b ON a.k = b.k [AND ..]
        WHEN MATCHED [AND c] THEN UPDATE SET x = e, ... | UPDATE SET * | DELETE
        WHEN NOT MATCHED [BY TARGET] [AND c] THEN INSERT (cols) VALUES (exprs)
                                                | INSERT *
        WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET ... | DELETE
    COPY INTO t FROM 'path' [FILEFORMAT = PARQUET|JSON|CSV]
        [PATTERN = 'glob'] [FORCE = TRUE]
                                      idempotent batch file loading: each
                                      source file loads AT MOST ONCE across
                                      reruns (commit-referenced ledger)
    OPTIMIZE t [ZORDER BY (a, b)]     compaction / Hilbert-Z clustering
    VACUUM t [RETAIN n HOURS] [DRY RUN]
    DESCRIBE HISTORY t
    DESCRIBE DETAIL t                 one-row manifest summary (files/bytes/
                                      rows/partitioning/version)
    RESTORE TABLE t TO VERSION AS OF n
    ALTER TABLE t ADD COLUMNS (col TYPE, ...) | DROP COLUMN col
    ALTER TABLE t ADD CONSTRAINT name CHECK (expr) | DROP CONSTRAINT name
    ALTER TABLE t CREATE|DROP BRANCH|TAG name [AT VERSION n]
    TRUNCATE TABLE t                  metadata-only, history intact
    SHOW CREATE TABLE t
    PUBLISH TABLE t FROM BRANCH 'b' [TO 'main'] [KEEP BRANCH]
    SHOW TABLES

Write-audit-publish in pure SQL: any DML/maintenance statement accepts a
branch-qualified target ``t@branch`` (reads too: ``FROM t@branch``), so the
loop is CREATE BRANCH → DML on ``t@b`` → audit with SELECTs on ``t@b`` →
PUBLISH TABLE.

Anything else raises ``SqlDialectError`` with the supported-form list —
loud refusal, never silent misinterpretation.
"""

from __future__ import annotations

import re
from datetime import date as _date
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .table.catalog import Catalog
from .table.icepack import IcepackTable

__all__ = ["IcepackSQL", "SqlDialectError"]


class SqlDialectError(ValueError):
    pass


# --------------------------------------------------------------------------
# lexical helpers: quote/paren-aware top-level scanning
# --------------------------------------------------------------------------

def _strip_comments(s: str) -> str:
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            j = i + 1
            while j < n:
                if s[j] == "'" and j + 1 < n and s[j + 1] == "'":
                    j += 2
                    continue
                if s[j] == "'":
                    break
                j += 1
            out.append(s[i : j + 1])
            i = j + 1
        elif c == "-" and s[i : i + 2] == "--":
            while i < n and s[i] != "\n":
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _top_level_mask(s: str, parens: bool = True) -> list[bool]:
    """mask[i] True iff position i is outside quotes (and, when ``parens``,
    outside any parenthesized group)."""
    mask = [True] * len(s)
    depth = 0
    i, n = 0, len(s)
    in_str = False
    while i < n:
        c = s[i]
        if in_str:
            mask[i] = False
            if c == "'":
                if i + 1 < n and s[i + 1] == "'":
                    mask[i + 1] = False
                    i += 2
                    continue
                in_str = False
        elif c == "'":
            in_str = True
            mask[i] = False
        elif c == "(" and parens:
            depth += 1
            mask[i] = False
        elif c == ")" and parens:
            mask[i] = False
            depth -= 1
        else:
            mask[i] = depth == 0
        i += 1
    return mask


def _match_paren(s: str, start: int) -> int:
    """Index of the ``)`` closing the ``(`` at ``start`` (quote-aware)."""
    depth = 0
    in_str = False
    for i in range(start, len(s)):
        c = s[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
    raise SqlDialectError(f"unbalanced parentheses near: {s[start:start+40]!r}")


def _split_top(s: str, sep: str) -> list[str]:
    """Split on regex ``sep`` matches that lie fully at top level."""
    mask = _top_level_mask(s)
    parts, last = [], 0
    for m in re.finditer(sep, s, re.IGNORECASE):
        if all(mask[i] for i in range(m.start(), m.end())):
            parts.append(s[last : m.start()])
            last = m.end()
    parts.append(s[last:])
    return parts


_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*"
# a table reference in statement position: name, optionally branch-qualified
# (t@branch) — the WAP surface: DML lands on the branch, PUBLISH swaps it in
_TREF = rf"{_IDENT}(?:@{_IDENT})?"


def _parse_literal(tok: str):
    tok = tok.strip()
    if re.fullmatch(r"'(?:[^']|'')*'", tok):
        return tok[1:-1].replace("''", "'")
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    if re.fullmatch(r"-?\d*\.\d+([eE][+-]?\d+)?|-?\d+[eE][+-]?\d+", tok):
        return float(tok)
    if tok.upper() in ("TRUE", "FALSE"):
        return tok.upper() == "TRUE"
    return None  # not a literal we can lift


_BETWEEN_SENTINEL = "\x00&\x00"


def _lift_filters(
    pred: str, fields: dict[str, T.DataType] | None = None
) -> tuple[list[tuple], str | None]:
    """Split a WHERE conjunction into manifest-prunable filters and a
    residual SQL string. Only top-level ANDs of ``col op literal`` /
    ``col BETWEEN a AND b`` / ``col IN (lits)`` lift; everything else stays
    residual (ANDed back row-level, so semantics never change).

    ``fields`` (lower-name → DataType) makes lifting TYPE-AWARE: a string
    literal against a TIMESTAMP/DATE column coerces to a datetime/date so
    manifest comparison uses the stats' own canonical form — comparing the
    raw SQL text (space separator) against stats serialized with a 'T'
    separator would FALSELY prune files and silently skip matching rows.
    Uncoercible literals simply stay residual (pruning lost, semantics
    kept)."""
    if _BETWEEN_SENTINEL in pred:  # can't mask BETWEEN safely: lift nothing
        return [], pred

    def _coerce(colname: str, v):
        if fields is None:
            return v
        dt = fields.get(colname.lower())
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            if isinstance(v, str):
                try:
                    return datetime.fromisoformat(v)
                except ValueError:
                    return None
            return None
        if isinstance(dt, T.DateType):
            if isinstance(v, str):
                try:
                    return _date.fromisoformat(v)
                except ValueError:
                    return None
            return None
        return v

    filters: list[tuple] = []
    residual: list[str] = []
    # BETWEEN owns an AND — mask those before splitting the conjunction
    for conj in _split_top(re.sub(
        r"\bBETWEEN\b(.+?)\bAND\b",
        lambda m: "BETWEEN" + m.group(1) + _BETWEEN_SENTINEL,
        pred, flags=re.IGNORECASE | re.DOTALL,
    ), r"\bAND\b"):
        conj = conj.replace(_BETWEEN_SENTINEL, "AND").strip()
        m = re.fullmatch(
            rf"({_IDENT})\s*(=|<=|>=|<|>)\s*(.+)", conj, re.DOTALL
        )
        if m and "." not in m.group(1):
            v = _parse_literal(m.group(3))
            if v is not None:
                v = _coerce(m.group(1), v)
            if v is not None:
                filters.append((m.group(1), m.group(2), v))
                continue
        m = re.fullmatch(
            rf"({_IDENT})\s+BETWEEN\s+(.+?)\s+AND\s+(.+)", conj,
            re.IGNORECASE | re.DOTALL,
        )
        if m and "." not in m.group(1):
            lo, hi = _parse_literal(m.group(2)), _parse_literal(m.group(3))
            if lo is not None and hi is not None:
                lo, hi = _coerce(m.group(1), lo), _coerce(m.group(1), hi)
            if lo is not None and hi is not None:
                filters.append((m.group(1), "between", (lo, hi)))
                continue
        m = re.fullmatch(
            rf"({_IDENT})\s+IN\s*\((.+)\)", conj, re.IGNORECASE | re.DOTALL
        )
        if m and "." not in m.group(1):
            vals = [_parse_literal(x) for x in _split_top(m.group(2), ",")]
            if all(v is not None for v in vals):
                vals = [_coerce(m.group(1), v) for v in vals]
            if all(v is not None for v in vals):
                filters.append((m.group(1), "in", tuple(vals)))
                continue
        residual.append(conj)
    return filters, (" AND ".join(f"({r})" for r in residual) or None)


from .operators._align import align_to_schema as _align_to_schema  # noqa: E402


def _split_assignments(set_clause: str) -> dict[str, str]:
    out = {}
    for item in _split_top(set_clause, ","):
        m = re.fullmatch(rf"\s*({_IDENT})\s*=\s*(.+?)\s*", item, re.DOTALL)
        if not m:
            raise SqlDialectError(f"cannot parse assignment: {item.strip()!r}")
        out[m.group(1)] = m.group(2)
    return out


# --------------------------------------------------------------------------
# the dispatcher
# --------------------------------------------------------------------------

class IcepackSQL:
    """Statement router bound to a :class:`Catalog`.

    ``execute`` always returns a DataFrame: query results for reads, a
    one-row report for DML/DDL/maintenance — uniform for driver scripts
    and ``foreachBatch`` bodies alike."""

    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog
        self._view_n = 0
        self._resolving_views: set[str] = set()

    # -------------------------------------------------------------- public
    def execute(self, stmt: str) -> DataFrame:
        s = _strip_comments(stmt).strip().rstrip(";").strip()
        head = s.split(None, 1)[0].upper() if s else ""
        two = " ".join(s.upper().split()[:2])
        if head in ("SELECT", "WITH"):
            return self.spark.sql(self._rewrite_refs(s))
        if two == "CREATE TABLE":
            return self._create_table(s)
        if two == "DROP TABLE":
            return self._drop_table(s)
        if two == "INSERT INTO" or two == "INSERT OVERWRITE":
            return self._insert(s)
        if two == "DELETE FROM":
            return self._delete(s)
        if head == "UPDATE":
            return self._update(s)
        if head == "MERGE":
            return self._merge(s)
        if two == "COPY INTO":
            return self._copy_into(s)
        if head == "OPTIMIZE":
            return self._optimize(s)
        if head == "VACUUM":
            return self._vacuum(s)
        if two == "DESCRIBE HISTORY":
            return self._history(s)
        if two == "DESCRIBE DETAIL":
            return self._detail(s)
        if two == "DESCRIBE STATS":
            return self._describe_stats(s)
        if two == "ANALYZE TABLE":
            return self._analyze(s)
        if two == "RESTORE TABLE":
            return self._restore(s)
        if two == "PUBLISH TABLE":
            return self._publish(s)
        if two == "ALTER TABLE":
            return self._alter(s)
        if two == "SHOW TABLES":
            return self.spark.createDataFrame(
                [(n,) for n in self.catalog.table_names()], "tableName STRING"
            )
        if two == "TRUNCATE TABLE":
            return self._truncate(s)
        if s.upper().startswith("SHOW CREATE TABLE"):
            return self._show_create(s)
        if re.match(r"CREATE\s+(OR\s+REPLACE\s+)?VIEW\b", s, re.IGNORECASE):
            return self._create_view(s)
        if two == "DROP VIEW":
            return self._drop_view(s)
        if two == "SHOW VIEWS":
            return self.spark.createDataFrame(
                [(n,) for n in self.catalog.view_names()] or [],
                "viewName STRING",
            )
        raise SqlDialectError(
            f"unsupported statement: {s[:60]!r}... — supported forms: "
            "SELECT/WITH, CREATE/DROP/TRUNCATE TABLE, CTAS, "
            "CREATE [OR REPLACE] VIEW / DROP VIEW / SHOW VIEWS, "
            "INSERT INTO/OVERWRITE, DELETE FROM, UPDATE, "
            "MERGE [WITH SCHEMA EVOLUTION] INTO, COPY INTO, OPTIMIZE, "
            "VACUUM, ANALYZE TABLE / DESCRIBE STATS, "
            "DESCRIBE HISTORY/DETAIL, RESTORE TABLE, "
            "PUBLISH TABLE, ALTER TABLE (ADD COLUMNS / ADD|DROP CONSTRAINT "
            "/ CREATE|DROP BRANCH|TAG), SHOW TABLES, SHOW CREATE TABLE"
        )

    # ------------------------------------------------------------- helpers
    def _table(self, name: str) -> IcepackTable:
        base, _, branch = name.partition("@")
        if not self.catalog.exists(base):
            raise SqlDialectError(f"table not found in catalog: {base!r}")
        t = self.catalog.load_table(base)
        if branch:
            try:
                return t.branch(branch)
            except KeyError as exc:
                raise SqlDialectError(str(exc)) from exc
        return t

    def _report(self, **kv) -> DataFrame:
        """One-row report with an explicit schema (None values — e.g. the
        no-op ``version`` — would defeat type inference)."""
        fields, vals = [], []
        for k, v in kv.items():
            if isinstance(v, bool):
                dt = T.BooleanType()
            elif isinstance(v, int):
                dt = T.LongType()
            elif isinstance(v, float):
                dt = T.DoubleType()
            elif v is None:
                # a None value carries no type; LONG keeps version-ish
                # fields (the common case) numeric, and Row access returns
                # None either way
                dt = T.LongType()
            else:
                dt, v = T.StringType(), str(v)
            fields.append(T.StructField(k, dt, True))
            vals.append(v)
        return self.spark.createDataFrame([tuple(vals)], T.StructType(fields))

    def _register_scan(self, name: str, version=None, ref=None, ts_ms=None) -> str:
        t = self._table(name)
        df = t.scan(version=version, ref=ref, as_of_timestamp_ms=ts_ms)
        self._view_n += 1
        view = f"__icepack_{re.sub('[^A-Za-z0-9_]', '_', name)}_{self._view_n}"
        df.createOrReplaceTempView(view)
        return view

    _INSPECT = ("history", "files", "partitions")

    def _rewrite_refs(self, s: str) -> str:
        """Replace catalog table refs (FROM/JOIN position, with optional
        time-travel suffix) by temp views over pinned scans; also resolve
        inspection refs ``t.history``/``t.files``/``t.partitions`` (Iceberg
        metadata tables) and the ``table_changes('t', from[, to])``
        table-valued function (Delta CDF). Subquery refs rewrite too; only
        string literals are off-limits."""
        s = self._rewrite_tvf(s)
        pat = (
            rf"\b(FROM|JOIN)\s+({_TREF})"
            rf"(\s+VERSION\s+AS\s+OF\s+(\d+|'[^']*')"
            rf"|\s+TIMESTAMP\s+AS\s+OF\s+'([^']*)')?"
        )
        mask = _top_level_mask(s, parens=False)  # strings only
        # standard SQL scoping: a CTE name shadows any catalog table of the
        # same name — collect them first and never rewrite those refs
        cte_names = {
            m.group(1).lower()
            for m in re.finditer(
                rf"(?:\bWITH\s+|,\s*)({_IDENT})\s+AS\s*\(", s, re.IGNORECASE
            )
            if mask[m.start(1)]
        }
        out, last = [], 0
        for m in re.finditer(pat, s, re.IGNORECASE):
            if not mask[m.start()]:
                continue
            name = m.group(2)
            if name.lower() in cte_names:
                continue
            if "@" in name:
                base, _, branch = name.partition("@")
                if not self.catalog.exists(base):
                    continue
                if m.group(3):
                    raise SqlDialectError(
                        f"{name}: pass a branch qualifier OR a time-travel "
                        "clause, not both"
                    )
                view = self._register_scan(base, ref=branch)
                out.append(s[last : m.start(1)])
                out.append(f"{m.group(1)} {view}")
                last = m.end()
                continue
            if not self.catalog.exists(name) and self.catalog.view_exists(name):
                if m.group(3):
                    raise SqlDialectError(
                        f"{name}: time travel does not apply to views"
                    )
                view = self._resolve_view(name)
                out.append(s[last : m.start(1)])
                out.append(f"{m.group(1)} {view}")
                last = m.end()
                continue
            if not self.catalog.exists(name):
                base, _, suffix = name.rpartition(".")
                if (
                    suffix in self._INSPECT
                    and base
                    and self.catalog.exists(base)
                ):
                    if m.group(3):
                        raise SqlDialectError(
                            f"{name}: time travel does not apply to "
                            "inspection tables"
                        )
                    t = self._table(base)
                    df = getattr(t, f"{suffix}_df")()
                    self._view_n += 1
                    view = f"__icepack_meta_{self._view_n}"
                    df.createOrReplaceTempView(view)
                    out.append(s[last : m.start(1)])
                    out.append(f"{m.group(1)} {view}")
                    last = m.end(2)
                continue
            version = ref = ts_ms = None
            if m.group(4):
                tok = m.group(4)
                if tok.startswith("'"):
                    ref = tok[1:-1]
                else:
                    version = int(tok)
            elif m.group(5):
                dt = datetime.fromisoformat(m.group(5))
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                ts_ms = int(dt.timestamp() * 1000)
            view = self._register_scan(name, version, ref, ts_ms)
            out.append(s[last : m.start(1)])
            out.append(f"{m.group(1)} {view}")
            last = m.end()
        out.append(s[last:])
        return "".join(out)

    def _rewrite_tvf(self, s: str) -> str:
        """``table_changes('t', from[, to][, 'key'])`` → temp view over the
        row-level change feed (operators/changes.py) — Delta's CDF
        table-valued function, computed driver-side with full Catalyst
        underneath. The optional trailing key names the merge column(s)
        (comma-separated) for commits on tables that never recorded one."""
        pat = (
            rf"\btable_changes\s*\(\s*'([^']+)'\s*,\s*(\d+)"
            rf"(?:\s*,\s*(\d+))?(?:\s*,\s*'([^']+)')?\s*\)"
        )
        mask = _top_level_mask(s, parens=False)

        def _one(m: re.Match) -> str:
            if not mask[m.start()]:
                return m.group(0)
            from .operators.changes import table_changes

            df = table_changes(
                self._table(m.group(1)),
                int(m.group(2)),
                int(m.group(3)) if m.group(3) else None,
                key=m.group(4).split(",") if m.group(4) else None,
            )
            self._view_n += 1
            view = f"__icepack_cdf_{self._view_n}"
            df.createOrReplaceTempView(view)
            return view

        return re.sub(pat, _one, s, flags=re.IGNORECASE)

    # ---------------------------------------------------------------- DDL
    def _create_table(self, s: str) -> DataFrame:
        m = re.match(
            rf"CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?({_IDENT})\s*",
            s, re.IGNORECASE,
        )
        if not m:
            raise SqlDialectError(f"cannot parse CREATE TABLE: {s[:80]!r}")
        if_not_exists, name = m.group(1), m.group(2)
        tail = s[m.end():].strip()
        cols = None
        if tail.startswith("("):
            close_i = _match_paren(tail, 0)
            cols = tail[1:close_i]
            tail = tail[close_i + 1 :].strip()
        spec = None
        mp = re.match(
            r"PARTITIONED\s+BY\s*\(", tail, re.IGNORECASE
        )
        if mp:
            close_i = _match_paren(tail, mp.end() - 1)
            spec = tail[mp.end() : close_i]
            tail = tail[close_i + 1 :].strip()
        select_sql = None
        ma = re.match(r"AS\s+(SELECT|WITH)\b", tail, re.IGNORECASE)
        if ma:
            select_sql = tail[ma.start(1):]
            tail = ""
        if tail:
            raise SqlDialectError(f"unexpected CREATE TABLE suffix: {tail[:60]!r}")
        if cols is None and select_sql is None:
            raise SqlDialectError(
                "CREATE TABLE needs a column list and/or AS SELECT"
            )
        if self.catalog.exists(name):
            if if_not_exists:
                return self._report(status="exists", table=name)
            raise SqlDialectError(f"table exists: {name}")
        if self.catalog.view_exists(name):
            raise SqlDialectError(f"a view named {name!r} already exists")
        try:
            self.catalog._check_reserved(name)
        except ValueError as exc:
            raise SqlDialectError(str(exc)) from exc
        df = (
            self.spark.sql(self._rewrite_refs(select_sql))
            if select_sql is not None
            else None
        )
        schema = T.StructType.fromDDL(cols) if cols is not None else df.schema
        partition_by = (
            [p.strip() for p in _split_top(spec, ",")] if spec else None
        )
        t = IcepackTable.create(
            self.spark, self.catalog._path(name), schema,
            partition_by=partition_by,
        )
        if df is not None:
            t.append(_align_to_schema(df, schema))
        return self._report(
            status="created", table=name,
            rows=t.count_rows() if df is not None else 0,
        )

    def _drop_table(self, s: str) -> DataFrame:
        m = re.fullmatch(
            rf"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?({_IDENT})\s*", s, re.IGNORECASE
        )
        if not m:
            raise SqlDialectError(f"cannot parse DROP TABLE: {s[:80]!r}")
        if_exists, name = m.groups()
        if not self.catalog.exists(name):
            if if_exists:
                return self._report(status="absent", table=name)
            raise SqlDialectError(f"table not found: {name}")
        self.catalog.drop_table(name)
        return self._report(status="dropped", table=name)

    def _alter(self, s: str) -> DataFrame:
        mc = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_TREF})\s+ADD\s+CONSTRAINT\s+({_IDENT})\s+"
            rf"CHECK\s*\((.*)\)\s*",
            s, re.IGNORECASE | re.DOTALL,
        )
        if mc:
            v = self._table(mc.group(1)).add_check_constraint(
                mc.group(2), mc.group(3)
            )
            return self._report(
                status="constraint-added", table=mc.group(1),
                name=mc.group(2), version=v,
            )
        md = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_TREF})\s+DROP\s+CONSTRAINT\s+({_IDENT})\s*",
            s, re.IGNORECASE,
        )
        if md:
            v = self._table(md.group(1)).drop_check_constraint(md.group(2))
            return self._report(
                status="constraint-dropped", table=md.group(1),
                name=md.group(2), version=v,
            )
        mb = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_IDENT})\s+(CREATE|DROP)\s+(BRANCH|TAG)\s+"
            rf"({_IDENT})(?:\s+AT\s+VERSION\s+(\d+))?\s*",
            s, re.IGNORECASE,
        )
        if mb:
            t = self._table(mb.group(1))
            verb, kind, ref = mb.group(2).upper(), mb.group(3).lower(), mb.group(4)
            if verb == "CREATE":
                at = int(mb.group(5)) if mb.group(5) else None
                v = (t.create_branch if kind == "branch" else t.create_tag)(ref, at)
                return self._report(
                    status=f"{kind}-created", table=mb.group(1), ref=ref, version=v
                )
            (t.drop_branch if kind == "branch" else t.drop_tag)(ref)
            return self._report(
                status=f"{kind}-dropped", table=mb.group(1), ref=ref
            )
        mdc = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_TREF})\s+DROP\s+COLUMN\s+({_IDENT})\s*",
            s, re.IGNORECASE,
        )
        if mdc:
            t = self._table(mdc.group(1))
            try:
                v = t.drop_column(mdc.group(2))
            except (KeyError, ValueError) as exc:
                raise SqlDialectError(str(exc)) from exc
            return self._report(
                status="column-dropped", table=mdc.group(1),
                column=mdc.group(2), version=v,
            )
        if re.match(
            rf"ALTER\s+TABLE\s+{_TREF}\s+RENAME\s+COLUMN\b", s, re.IGNORECASE
        ):
            raise SqlDialectError(
                "RENAME COLUMN needs physical-name column mapping, which "
                "this format does not implement — copy into a new column "
                "and DROP COLUMN the old one instead"
            )
        m = re.fullmatch(
            rf"ALTER\s+TABLE\s+({_TREF})\s+ADD\s+COLUMNS?\s*\((.*)\)\s*",
            s, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlDialectError(
                "only ALTER TABLE t ADD COLUMNS (...) / DROP COLUMN "
                "/ ADD|DROP CONSTRAINT "
                f"/ CREATE|DROP BRANCH|TAG is supported: {s[:80]!r}"
            )
        t = self._table(m.group(1))
        add = T.StructType.fromDDL(m.group(2))
        merged = T.StructType(t.snapshot().schema.fields + add.fields)
        v = t.evolve_schema(merged, strategy="merge")
        return self._report(
            status="altered" if v is not None else "no-op",
            table=m.group(1), version=v,
        )

    # ---------------------------------------------------------------- DML
    def _insert(self, s: str) -> DataFrame:
        # the column-list group must NOT swallow a parenthesized query:
        # `INSERT INTO t (SELECT ...)` has no column list
        m = re.match(
            rf"INSERT\s+(INTO|OVERWRITE)\s+({_TREF})\s*"
            rf"(\(\s*(?!SELECT\b|WITH\b)([^)]*)\))?\s*(.*)",
            s, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlDialectError(f"cannot parse INSERT: {s[:80]!r}")
        mode, name, _, collist, body = m.groups()
        t = self._table(name)
        tcols = [f.name for f in t.snapshot().schema.fields]
        cols = (
            [c.strip() for c in collist.split(",")] if collist else tcols
        )
        body = body.strip()
        if body.upper().startswith("VALUES"):
            df = self.spark.sql(
                f"SELECT * FROM {body} AS __v({', '.join(cols)})"
            )
        elif body.upper().startswith(("SELECT", "WITH", "(")):
            # peel ONE balanced outer paren layer if it wraps the whole body
            while body.startswith("(") and _match_paren(body, 0) == len(body) - 1:
                body = body[1:-1].strip()
            df = self.spark.sql(self._rewrite_refs(body))
            if len(df.columns) != len(cols):
                raise SqlDialectError(
                    f"INSERT column count mismatch: {len(cols)} target vs "
                    f"{len(df.columns)} query columns"
                )
            df = df.toDF(*cols)
        else:
            raise SqlDialectError(f"INSERT body must be VALUES or SELECT: {body[:60]!r}")
        out = _align_to_schema(df, t.snapshot().schema)
        if mode.upper() == "OVERWRITE":
            v = t.overwrite_all(out)
        else:
            v = t.append(out)
        return self._report(status="inserted", table=name, version=v, mode=mode.lower())

    def _delete(self, s: str) -> DataFrame:
        m = re.fullmatch(
            rf"DELETE\s+FROM\s+({_TREF})\s+WHERE\s+(.+)", s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlDialectError(
                f"cannot parse DELETE (WHERE is required): {s[:80]!r}"
            )
        from .operators.rowops import delete_where

        t = self._table(m.group(1))
        fields = {f.name.lower(): f.dataType for f in t.snapshot().schema.fields}
        filters, residual = _lift_filters(m.group(2), fields)
        rep = delete_where(t, filters, residual)
        return self._report(table=m.group(1), **{k: v for k, v in rep.items() if k != "predicate"})

    def _update(self, s: str) -> DataFrame:
        m = re.fullmatch(
            rf"UPDATE\s+({_TREF})\s+SET\s+(.+?)\s+WHERE\s+(.+)", s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlDialectError(
                f"cannot parse UPDATE (SET and WHERE required): {s[:80]!r}"
            )
        from .operators.rowops import update_where

        t = self._table(m.group(1))
        fields = {f.name.lower(): f.dataType for f in t.snapshot().schema.fields}
        assignments = _split_assignments(m.group(2))
        filters, residual = _lift_filters(m.group(3), fields)
        rep = update_where(t, assignments, filters, residual)
        return self._report(table=m.group(1), **{k: v for k, v in rep.items() if k not in ("predicate", "assignments")})

    # -------------------------------------------------------------- MERGE
    def _merge(self, s: str) -> DataFrame:
        m = re.match(
            rf"MERGE\s+(WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+({_TREF})"
            rf"(?:\s+AS)?(?:\s+({_IDENT}))?\s+USING\s+",
            s, re.IGNORECASE,
        )
        if not m:
            raise SqlDialectError(f"cannot parse MERGE INTO: {s[:80]!r}")
        evolve = "merge" if m.group(1) else "none"
        # a branch-qualified target's default alias is the BASE name —
        # `MERGE INTO t@audit ... ON t.k = s.k` must just work
        target_name = m.group(2)
        t_alias = m.group(3) or target_name.partition("@")[0]
        rest = s[m.end():]
        # source: parenthesized subquery or identifier (quote-aware scan —
        # a ')' inside a string literal must not terminate the subquery)
        if rest.lstrip().startswith("("):
            rest = rest.lstrip()
            i = _match_paren(rest, 0)
            src_sql, rest = rest[1:i], rest[i + 1 :]
            src_df = self.spark.sql(self._rewrite_refs(src_sql))
        else:
            ms = re.match(rf"\s*({_IDENT})", rest)
            if not ms:
                raise SqlDialectError("cannot parse MERGE USING source")
            src_name, rest = ms.group(1), rest[ms.end():]
            if self.catalog.exists(src_name):
                src_df = self._table(src_name).scan()
            else:
                src_df = self.spark.table(src_name)  # temp view
        ma = re.match(rf"\s*(?:AS\s+)?({_IDENT})?\s*ON\s+", rest, re.IGNORECASE)
        if not ma:
            raise SqlDialectError("cannot parse MERGE: expected [AS alias] ON <cond>")
        s_alias = ma.group(1) or "s"
        if t_alias.lower() == s_alias.lower():
            raise SqlDialectError(
                f"MERGE target and source aliases must differ (both {t_alias!r})"
            )
        rest = rest[ma.end():]
        # clause boundaries: WHEN [NOT] MATCHED [...] at top level — a bare
        # \bWHEN\b split would also fire on CASE WHEN inside SET expressions
        cmask = _top_level_mask(rest)
        kind_pat = re.compile(
            r"\bWHEN\s+(NOT\s+MATCHED\s+BY\s+SOURCE"
            r"|NOT\s+MATCHED(?:\s+BY\s+TARGET)?|MATCHED)\b",
            re.IGNORECASE,
        )
        marks = [
            mm
            for mm in kind_pat.finditer(rest)
            if all(cmask[i] for i in range(mm.start(), mm.end()))
        ]
        if not marks:
            raise SqlDialectError("MERGE requires at least one WHEN clause")
        on_sql = rest[: marks[0].start()]
        clause_parts: list[tuple[str, str]] = []
        for i, mm in enumerate(marks):
            end = marks[i + 1].start() if i + 1 < len(marks) else len(rest)
            kind = re.sub(r"\s+", " ", mm.group(1).upper())
            if kind == "NOT MATCHED BY TARGET":
                kind = "NOT MATCHED"
            clause_parts.append((kind, rest[mm.end() : end]))

        def canon(expr: str) -> str:
            """Alias → canonical t./s. in ONE pass (sequential substitution
            turns `s`/`t` alias swaps into self-references) and only outside
            string literals."""
            emask = _top_level_mask(expr, parens=False)
            pat = re.compile(
                rf"\b({re.escape(t_alias)}|{re.escape(s_alias)})\.",
                re.IGNORECASE,
            )
            out, last = [], 0
            for mm in pat.finditer(expr):
                if not emask[mm.start()]:
                    continue
                out.append(expr[last : mm.start()])
                out.append(
                    "t." if mm.group(1).lower() == t_alias.lower() else "s."
                )
                last = mm.end()
            out.append(expr[last:])
            return "".join(out)

        on_keys: list[str] = []
        for conj in _split_top(on_sql, r"\bAND\b"):
            mk = re.fullmatch(
                rf"\s*({_IDENT})\.({_IDENT})\s*=\s*({_IDENT})\.({_IDENT})\s*",
                conj,
            )
            if not mk:
                raise SqlDialectError(
                    f"MERGE ON must be equi-conjunctions alias.col = alias.col "
                    f"(got {conj.strip()!r}) — put extra predicates in clause "
                    "conditions, which also keeps file pruning effective"
                )
            a1, c1, a2, c2 = mk.groups()
            pair = {a1.lower(): c1, a2.lower(): c2}
            if (
                set(pair) != {t_alias.lower(), s_alias.lower()}
                or c1.lower() != c2.lower()  # identifiers are case-insensitive
            ):
                raise SqlDialectError(
                    f"MERGE ON keys must pair target and source on the SAME "
                    f"column name (got {conj.strip()!r})"
                )
            on_keys.append(pair[t_alias.lower()])  # target-side spelling

        matched, not_matched, nms = [], [], []
        for kind, ct in clause_parts:
            # split [AND cond] THEN action at the first TOP-LEVEL THEN (a
            # parenthesized CASE ... THEN in the condition stays intact)
            tmask = _top_level_mask(ct)
            mt = next(
                (
                    mm
                    for mm in re.finditer(r"\bTHEN\b", ct, re.IGNORECASE)
                    if all(tmask[i] for i in range(mm.start(), mm.end()))
                ),
                None,
            )
            if mt is None:
                raise SqlDialectError(f"WHEN clause missing THEN: {ct[:80]!r}")
            cond_txt = ct[: mt.start()].strip()
            cond = None
            if cond_txt:
                mc = re.fullmatch(r"AND\s+(.*)", cond_txt, re.IGNORECASE | re.DOTALL)
                if not mc:
                    raise SqlDialectError(
                        f"WHEN clause condition must start with AND: {cond_txt[:60]!r}"
                    )
                cond = canon(mc.group(1).strip())
            action = ct[mt.end() :].strip()
            au = action.upper()
            if au == "DELETE":
                if kind == "NOT MATCHED":
                    raise SqlDialectError(
                        "WHEN NOT MATCHED allows only INSERT — DELETE on "
                        "unmatched rows is WHEN NOT MATCHED BY SOURCE"
                    )
                cl = {"action": "delete", "condition": cond}
                (nms if kind == "NOT MATCHED BY SOURCE" else matched).append(cl)
            elif au.startswith("UPDATE"):
                if kind == "NOT MATCHED":
                    raise SqlDialectError(
                        "WHEN NOT MATCHED allows only INSERT — UPDATE of "
                        "unmatched rows is WHEN NOT MATCHED BY SOURCE"
                    )
                mu = re.fullmatch(r"UPDATE\s+SET\s+(.*)", action, re.IGNORECASE | re.DOTALL)
                if not mu:
                    raise SqlDialectError(f"cannot parse UPDATE action: {action[:60]!r}")
                body = mu.group(1).strip()
                st = "*" if body == "*" else {
                    re.sub(r"^t\.", "", canon(k)): canon(v)
                    for k, v in _split_assignments(body).items()
                }
                cl = {"action": "update", "condition": cond, "set": st}
                (nms if kind == "NOT MATCHED BY SOURCE" else matched).append(cl)
            elif au.startswith("INSERT"):
                if kind != "NOT MATCHED":
                    raise SqlDialectError(
                        f"INSERT is only valid in WHEN NOT MATCHED (got WHEN {kind})"
                    )
                body = action[len("INSERT"):].strip()
                if body == "*":
                    vals = "*"
                else:
                    mi = re.fullmatch(
                        r"\(([^)]*)\)\s*VALUES\s*\((.*)\)", body,
                        re.IGNORECASE | re.DOTALL,
                    )
                    if not mi:
                        raise SqlDialectError(
                            f"INSERT must be `INSERT *` or `INSERT (cols) VALUES (exprs)`: {body[:60]!r}"
                        )
                    cols = [c.strip() for c in mi.group(1).split(",")]
                    exprs = [canon(e.strip()) for e in _split_top(mi.group(2), ",")]
                    if len(cols) != len(exprs):
                        raise SqlDialectError("INSERT column/value count mismatch")
                    vals = dict(zip(cols, exprs))
                not_matched.append({"action": "insert", "condition": cond, "values": vals})
            else:
                raise SqlDialectError(f"unknown MERGE action: {action[:40]!r}")

        from .operators.generic_merge import merge_into

        rep = merge_into(
            self._table(target_name), src_df, on_keys,
            matched=matched, not_matched=not_matched,
            not_matched_by_source=nms, schema_evolution=evolve,
        )
        return self._report(table=target_name, **rep)

    def _copy_into(self, s: str) -> DataFrame:
        m = re.fullmatch(
            rf"COPY\s+INTO\s+({_TREF})\s+FROM\s+'([^']+)'"
            rf"(?:\s+FILEFORMAT\s*=\s*(\w+))?"
            rf"(?:\s+PATTERN\s*=\s*'([^']+)')?"
            rf"(?:\s+FORCE\s*=\s*(TRUE|FALSE))?\s*",
            s, re.IGNORECASE,
        )
        if not m:
            raise SqlDialectError(
                "cannot parse COPY INTO — form: COPY INTO t FROM 'path' "
                "[FILEFORMAT = PARQUET|JSON|CSV] [PATTERN = 'glob'] "
                f"[FORCE = TRUE]: {s[:80]!r}"
            )
        from .operators.copy_into import copy_into

        rep = copy_into(
            self._table(m.group(1)),
            m.group(2),
            file_format=(m.group(3) or "parquet"),
            pattern=m.group(4),
            force=bool(m.group(5) and m.group(5).upper() == "TRUE"),
        )
        return self._report(table=m.group(1), **rep)

    # -------------------------------------------------------- maintenance
    def _optimize(self, s: str) -> DataFrame:
        m = re.fullmatch(
            rf"OPTIMIZE\s+({_TREF})(\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*",
            s, re.IGNORECASE,
        )
        if not m:
            raise SqlDialectError(f"cannot parse OPTIMIZE: {s[:80]!r}")
        t = self._table(m.group(1))
        if m.group(3):
            from .operators.clustering import cluster

            cols = tuple(c.strip() for c in m.group(3).split(","))
            if len(cols) != 2:
                raise SqlDialectError(
                    "ZORDER BY takes exactly two columns (the 2-D "
                    "Hilbert/Z curve surface)"
                )
            v = cluster(t, cols=cols)
            return self._report(status="clustered", table=m.group(1), version=v, zorder_by=",".join(cols))
        from .operators.compaction import compact

        v = compact(t)
        return self._report(
            status="compacted" if v is not None else "no-op",
            table=m.group(1), version=v,
        )

    def _vacuum(self, s: str) -> DataFrame:
        m = re.fullmatch(
            rf"VACUUM\s+({_TREF})(\s+RETAIN\s+(\d+)\s+HOURS)?(\s+DRY\s+RUN)?\s*",
            s, re.IGNORECASE,
        )
        if not m:
            raise SqlDialectError(f"cannot parse VACUUM: {s[:80]!r}")
        from .operators.expire import remove_orphans

        grace = int(m.group(3)) * 3600 if m.group(3) else 3 * 24 * 3600
        rep = remove_orphans(
            self._table(m.group(1)), grace_seconds=grace, dry_run=bool(m.group(4))
        )
        return self._report(
            table=m.group(1), dry_run=bool(m.group(4)),
            n_orphans=rep["n_orphans"],
            n_deleted=rep.get("n_deleted", 0),
        )

    def _history(self, s: str) -> DataFrame:
        m = re.fullmatch(rf"DESCRIBE\s+HISTORY\s+({_TREF})\s*", s, re.IGNORECASE)
        if not m:
            raise SqlDialectError(f"cannot parse DESCRIBE HISTORY: {s[:80]!r}")
        return self._table(m.group(1)).history_df()

    def _detail(self, s: str) -> DataFrame:
        m = re.fullmatch(rf"DESCRIBE\s+DETAIL\s+({_TREF})\s*", s, re.IGNORECASE)
        if not m:
            raise SqlDialectError(f"cannot parse DESCRIBE DETAIL: {s[:80]!r}")
        t = self._table(m.group(1))
        snap = t.snapshot()
        data = [e for e in t.files() if e.content == "data"]
        return self._report(
            format="icepack",
            location=t.root,
            version=snap.version,
            operation=snap.operation,
            numFiles=len(data),
            sizeInBytes=sum(e.bytes for e in data),
            numRows=t.count_rows(),
            partitionColumns=",".join(t.partition_spec()),
            numDeleteFiles=len(t.files()) - len(data),
        )

    _NDV_TYPES = ("binary", "array", "map", "struct")

    def _analyze(self, s: str) -> DataFrame:
        """``ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS a, b | FOR ALL
        COLUMNS] [WITH EXACT NDV]`` — ONE aggregation job over the resolved
        scan: row count plus per-column ndv / null_count / min / max,
        persisted beside the snapshots and stamped with the head version.
        NDV uses the JVM HyperLogLog++ (``approx_count_distinct``) by
        default — the only sane choice at 10^12 rows — or exact
        ``count(DISTINCT)`` under WITH EXACT NDV for small tables and
        oracle checks. Nested/binary columns get null/ndv only (no
        min/max ordering)."""
        m = re.fullmatch(
            rf"ANALYZE\s+TABLE\s+({_TREF})\s+COMPUTE\s+STATISTICS"
            rf"(?:\s+FOR\s+COLUMNS\s+([A-Za-z0-9_,\s]+?)|\s+FOR\s+ALL\s+COLUMNS)?"
            rf"(\s+WITH\s+EXACT\s+NDV)?\s*",
            s, re.IGNORECASE,
        )
        if not m:
            raise SqlDialectError(
                "cannot parse — form: ANALYZE TABLE t COMPUTE STATISTICS "
                f"[FOR COLUMNS a, b | FOR ALL COLUMNS] [WITH EXACT NDV]: {s[:80]!r}"
            )
        if "@" in m.group(1):
            raise SqlDialectError(
                "ANALYZE on a branch ref is not supported — statistics are "
                "stored per table and would shadow the main table's"
            )
        t = self._table(m.group(1))
        snap = t.snapshot()
        schema = snap.schema
        if m.group(2):
            want = [c.strip() for c in m.group(2).split(",") if c.strip()]
            known = {f.name for f in schema.fields}
            bad = [c for c in want if c not in known]
            if bad:
                raise SqlDialectError(f"unknown columns in ANALYZE: {bad}")
        else:
            want = [f.name for f in schema.fields]
        exact = bool(m.group(3))
        df = t.scan()
        aggs = [F.count(F.lit(1)).alias("__n")]
        by_type = {f.name: f.dataType.simpleString() for f in schema.fields}
        for c in want:
            ndv = (
                F.countDistinct(F.col(c)) if exact
                else F.approx_count_distinct(F.col(c))
            )
            aggs.append(ndv.alias(f"__ndv__{c}"))
            aggs.append(
                F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls__{c}")
            )
            if not by_type[c].startswith(self._NDV_TYPES):
                aggs.append(F.min(F.col(c)).cast("string").alias(f"__min__{c}"))
                aggs.append(F.max(F.col(c)).cast("string").alias(f"__max__{c}"))
        row = df.agg(*aggs).collect()[0].asDict()
        cols = {}
        for c in want:
            cols[c] = {
                "ndv": int(row[f"__ndv__{c}"]),
                "null_count": int(row[f"__nulls__{c}"]),
                "min": row.get(f"__min__{c}"),
                "max": row.get(f"__max__{c}"),
                "exact_ndv": exact,
            }
        t.set_table_stats(
            {"version": snap.version, "row_count": int(row["__n"]), "columns": cols}
        )
        return self._report(
            status="analyzed", table=m.group(1), version=snap.version,
            row_count=int(row["__n"]), columns_analyzed=len(want),
            exact_ndv=exact,
        )

    def _describe_stats(self, s: str) -> DataFrame:
        """One row per analyzed column from the stored stats file — stale
        stats are visible via the recorded version vs the current head."""
        m = re.fullmatch(
            rf"DESCRIBE\s+STATS\s+({_TREF})\s*", s, re.IGNORECASE
        )
        if not m:
            raise SqlDialectError(f"cannot parse DESCRIBE STATS: {s[:80]!r}")
        if "@" in m.group(1):
            raise SqlDialectError(
                "DESCRIBE STATS on a branch ref is not supported — "
                "statistics are stored per table"
            )
        t = self._table(m.group(1))
        stats = t.table_stats()
        if stats is None:
            raise SqlDialectError(
                f"no statistics for {m.group(1)!r} — run ANALYZE TABLE first"
            )
        rows = [
            (
                c,
                int(v["ndv"]),
                int(v["null_count"]),
                v.get("min"),
                v.get("max"),
                bool(v.get("exact_ndv")),
                int(stats["version"]),
                int(stats["row_count"]),
            )
            for c, v in sorted(stats["columns"].items())
        ]
        return self.spark.createDataFrame(
            rows,
            "column STRING, ndv BIGINT, null_count BIGINT, min STRING, "
            "max STRING, exact_ndv BOOLEAN, stats_version BIGINT, "
            "row_count BIGINT",
        )

    def _truncate(self, s: str) -> DataFrame:
        """Metadata-only removal of every data file — history stays intact
        (time travel to the pre-truncate snapshot still works; VACUUM/expiry
        reclaims the bytes later), exactly Delta's TRUNCATE."""
        m = re.fullmatch(rf"TRUNCATE\s+TABLE\s+({_TREF})\s*", s, re.IGNORECASE)
        if not m:
            raise SqlDialectError(f"cannot parse TRUNCATE TABLE: {s[:80]!r}")
        t = self._table(m.group(1))
        entries = t.files()
        n = t.count_rows()
        v = t.commit(
            "truncate",
            added=[],
            removed_paths=[e.path for e in entries],
            summary={"rows_removed": n},
        )
        return self._report(
            status="truncated", table=m.group(1), version=v, rows_removed=n
        )

    def _show_create(self, s: str) -> DataFrame:
        m = re.fullmatch(
            rf"SHOW\s+CREATE\s+TABLE\s+({_IDENT})\s*", s, re.IGNORECASE
        )
        if not m:
            raise SqlDialectError(f"cannot parse SHOW CREATE TABLE: {s[:80]!r}")
        t = self._table(m.group(1))
        schema = t.snapshot().schema
        cols = ",\n  ".join(
            f"{f.name} {f.dataType.simpleString().upper()}" for f in schema.fields
        )
        stmt = f"CREATE TABLE {m.group(1)} (\n  {cols}\n)"
        spec = t.partition_spec()
        if spec:
            stmt += f"\nPARTITIONED BY ({', '.join(spec)})"
        for name, expr in sorted(t.check_constraints().items()):
            stmt += f"\n-- ALTER TABLE {m.group(1)} ADD CONSTRAINT {name} CHECK ({expr})"
        return self._report(createtab_stmt=stmt)

    # --------------------------------------------------------------- views
    def _resolve_view(self, name: str) -> str:
        """Materialize a catalog view as a temp view over its re-planned
        SELECT (view TEXT semantics, like Delta/HMS: each read sees current
        table state). Nested views recurse through ``_rewrite_refs``; a
        cycle fails loudly instead of recursing forever."""
        if name in self._resolving_views:
            raise SqlDialectError(f"view cycle detected at {name!r}")
        self._resolving_views.add(name)
        try:
            df = self.spark.sql(self._rewrite_refs(self.catalog.view_sql(name)))
        finally:
            self._resolving_views.discard(name)
        self._view_n += 1
        view = f"__icepack_view_{re.sub('[^A-Za-z0-9_]', '_', name)}_{self._view_n}"
        df.createOrReplaceTempView(view)
        return view

    def _create_view(self, s: str) -> DataFrame:
        m = re.match(
            rf"CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+({_IDENT})\s+AS\s+(.+)",
            s, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise SqlDialectError(
                f"cannot parse — form: CREATE [OR REPLACE] VIEW v AS "
                f"SELECT ...: {s[:80]!r}"
            )
        or_replace, name, body = bool(m.group(1)), m.group(2), m.group(3).strip()
        if not body.upper().startswith(("SELECT", "WITH", "(")):
            raise SqlDialectError("view body must be a SELECT/WITH query")
        # validate now: the body must plan against the current catalog
        # (spark.sql is lazy, so this costs analysis only, no execution)
        self.spark.sql(self._rewrite_refs(body))
        try:
            self.catalog.create_view(name, body, or_replace=or_replace)
        except FileExistsError as exc:
            raise SqlDialectError(str(exc)) from exc
        return self._report(status="created", view=name, replaced=or_replace)

    def _drop_view(self, s: str) -> DataFrame:
        m = re.fullmatch(
            rf"DROP\s+VIEW\s+(IF\s+EXISTS\s+)?({_IDENT})\s*", s, re.IGNORECASE
        )
        if not m:
            raise SqlDialectError(f"cannot parse DROP VIEW: {s[:80]!r}")
        dropped = self.catalog.drop_view(m.group(2))
        if not dropped and not m.group(1):
            raise SqlDialectError(f"view not found: {m.group(2)!r}")
        return self._report(status="dropped", view=m.group(2), existed=dropped)

    def _publish(self, s: str) -> DataFrame:
        """WAP publish: fast-forward main (or another branch) onto a branch
        head — the SQL counterpart of the write-audit-publish loop whose
        writes landed via ``t@branch`` DML."""
        m = re.fullmatch(
            rf"PUBLISH\s+TABLE\s+({_IDENT})\s+FROM\s+BRANCH\s+'([^']+)'"
            rf"(?:\s+TO\s+'([^']+)')?(\s+KEEP\s+BRANCH)?\s*",
            s, re.IGNORECASE,
        )
        if not m:
            raise SqlDialectError(
                "cannot parse PUBLISH — form: PUBLISH TABLE t FROM BRANCH "
                f"'b' [TO 'main'] [KEEP BRANCH]: {s[:80]!r}"
            )
        t = self._table(m.group(1))
        v = t.fast_forward(m.group(2), m.group(3) or "main")
        if not m.group(4):
            t.drop_branch(m.group(2))
        return self._report(
            status="published", table=m.group(1), branch=m.group(2),
            to=m.group(3) or "main", version=v,
            branch_kept=bool(m.group(4)),
        )

    def _restore(self, s: str) -> DataFrame:
        m = re.fullmatch(
            rf"RESTORE\s+TABLE\s+({_IDENT})\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*",
            s, re.IGNORECASE,
        )
        if not m:
            raise SqlDialectError(f"cannot parse RESTORE TABLE: {s[:80]!r}")
        v = self._table(m.group(1)).rollback(int(m.group(2)))
        return self._report(status="restored", table=m.group(1), version=v, restored_to=int(m.group(2)))
