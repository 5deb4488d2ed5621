"""SQL DDL surface for continuous aggregates.

TimescaleDB declares materialized views in SQL (`CREATE MATERIALIZED VIEW
... WITH (timescaledb.continuous) AS SELECT time_bucket(...), ... GROUP
BY ...`); this module gives `engine/cagg.py` the same front door: one SQL
string compiles to the (keys, aggs, filter) spec of a
`ContinuousAggregate`, so a view can be declared, versioned, and
refreshed without writing Python dicts. The grammar is deliberately
restricted to what the mergeable-partial algebra can maintain — anything
outside it is a parse-time error naming the offending item, never a
silently-wrong view.

Grammar (keywords case-insensitive, expressions are Spark SQL):

    [CREATE CONTINUOUS AGGREGATE [<name>] AS]
    SELECT <item> [, <item> ...]
    FROM hourly | <parent view name>
    [WHERE <predicate>]
    GROUP BY <name | position> [, ...]

Each <item> is `expr AS alias` (a bare column name may omit the alias).
Items named in GROUP BY (by alias or 1-based position) become the view
keys; every other item must be an aggregate call from the cagg algebra:

    sum(e) count(*) count(e) min(e) max(e) avg(e)
    approx_distinct(e)          -- HLL
    distinct_kmv(e, k)          -- bottom-k exact-until-saturation
    first(v, o)  last(v, o)     -- value v ordered by o
    twa(state_col)              -- time-weighted avg from twa tier state
    percentile_qsk(state_col, q)

A view over another view (FROM <parent>) uses TimescaleDB's hierarchical
idiom instead: every aggregate must be `rollup(parent_agg)` (re-merge the
parent's day-partial state) or `rollup(parent_agg, q)` (the
percentile_qsk finalize-q override) — the child never re-reads the
hourly tier. The same parse feeds `ContinuousAggregate` directly, so a
SQL-declared view is spec-token-identical to its dict-declared twin and
can adopt an existing partials table without a rebuild.

Because the compiled spec hashes into `_SPEC`, editing the SQL text in a
semantically-meaningful way (new item, changed predicate) is exactly a
spec evolution: one full rebuild, then incremental again — no separate
migration path for "the view was declared in SQL".
"""

from __future__ import annotations

from .cagg import KINDS, ContinuousAggregate


class CaggSQLError(ValueError):
    """A declaration the restricted grammar cannot maintain."""


# -- lexical helpers ------------------------------------------------------

def _scan_top_level(sql: str):
    """Yield (index, char, depth, in_quote) for structural scanning:
    depth counts unquoted parens; quotes are SQL '...' / "..." (a doubled
    quote inside a literal toggles twice, which is fine — we only need
    structure, not values)."""
    depth = 0
    quote = None
    for i, ch in enumerate(sql):
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise CaggSQLError(f"unbalanced ')' at offset {i}")
        yield i, ch, depth, quote


def _find_keyword(sql: str, word: str, start: int = 0) -> int:
    """Index of the first top-level, word-boundary occurrence of `word`
    (case-insensitive, spaces in `word` match any whitespace run), or -1."""
    upper = sql.upper()
    parts = word.split()
    positions = [
        i for i, ch, depth, quote in _scan_top_level(sql) if depth == 0 and not quote
    ]
    top = set(positions)
    i = start
    while True:
        i = upper.find(parts[0], i)
        if i == -1:
            return -1
        # word boundary + top level
        before_ok = i == 0 or not (upper[i - 1].isalnum() or upper[i - 1] == "_")
        j = i + len(parts[0])
        ok = before_ok and i in top
        for p in parts[1:]:
            while ok and j < len(sql) and sql[j].isspace():
                j += 1
            if not ok or not upper.startswith(p, j):
                ok = False
                break
            j += len(p)
        if ok and (j >= len(sql) or not (upper[j].isalnum() or upper[j] == "_")):
            return i
        i += 1


def _split_top(sql: str, sep: str = ",") -> list[str]:
    """Split on top-level separators, trimming each part."""
    parts, last = [], 0
    for i, ch, depth, quote in _scan_top_level(sql):
        if ch == sep and depth == 0 and not quote:
            parts.append(sql[last:i].strip())
            last = i + 1
    parts.append(sql[last:].strip())
    return parts


def _split_alias(item: str) -> tuple[str, str]:
    """`expr AS alias` → (expr, alias); a bare identifier aliases itself."""
    pos, found = 0, -1
    while True:
        nxt = _find_keyword(item, "AS", pos)
        if nxt == -1:
            break
        found, pos = nxt, nxt + 2
    if found != -1:
        expr, alias = item[:found].strip(), item[found + 2 :].strip()
        if not alias.replace("_", "").isalnum() or alias[0].isdigit():
            raise CaggSQLError(f"invalid alias {alias!r} in item {item!r}")
        return expr, alias
    bare = item.strip()
    if bare.replace("_", "").isalnum() and not bare[0].isdigit():
        return bare, bare
    raise CaggSQLError(
        f"select item {item!r} needs an AS alias (only bare column names may omit it)"
    )


def _parse_call(expr: str) -> tuple[str, list[str]] | None:
    """`fn(a, b)` → ('fn', ['a', 'b']) when the WHOLE expr is one call."""
    s = expr.strip()
    open_i = s.find("(")
    if open_i <= 0 or not s.endswith(")"):
        return None
    fn = s[:open_i].strip()
    if not fn.replace("_", "").isalnum():
        return None
    inner = s[open_i + 1 : -1]
    # the call must span the whole expr: depth never returns to 0 inside
    depth = 0
    quote = None
    for ch in inner:
        if quote:
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return None
    if depth != 0:
        return None
    args = [] if inner.strip() == "" else _split_top(inner)
    return fn.lower(), args


def _agg_spec(name: str, fn: str, args: list[str]) -> tuple:
    """Map a parsed aggregate call onto a cagg algebra spec tuple."""
    if fn == "count":
        if args == ["*"] or args == []:
            return ("count",)
        if len(args) == 1:
            return ("count", args[0])
    elif fn in ("sum", "min", "max", "avg", "approx_distinct", "twa"):
        if len(args) == 1:
            return (fn, args[0])
    elif fn == "distinct_kmv":
        if len(args) == 2:
            return (fn, args[0], int(args[1]))
    elif fn == "percentile_qsk":
        if len(args) == 2:
            return (fn, args[0], float(args[1]))
    elif fn in ("first", "last"):
        if len(args) == 2:
            return (fn, args[0], args[1])
    if fn in KINDS:
        raise CaggSQLError(f"{name}: {fn} got {len(args)} argument(s)")
    raise CaggSQLError(
        f"{name}: {fn!r} is not in the mergeable cagg algebra {sorted(KINDS)} — "
        "a continuous aggregate can only maintain decomposable aggregates"
    )


# -- the parser -----------------------------------------------------------

def parse_cagg_sql(sql: str) -> dict:
    """Compile a view declaration to
    ``{"source", "keys", "aggs", "filter"}``. For ``FROM hourly`` the aggs
    are algebra spec tuples; for a parent-view source they are the
    ``rollup()`` adoption map a `HierarchicalAggregate` takes."""
    s = sql.strip().rstrip(";")
    create_i = _find_keyword(s, "CREATE CONTINUOUS AGGREGATE")
    if create_i == 0:
        as_i = _find_keyword(s, "AS")
        if as_i == -1:
            raise CaggSQLError("CREATE CONTINUOUS AGGREGATE ... missing AS")
        s = s[as_i + 2 :].strip()
    sel_i = _find_keyword(s, "SELECT")
    from_i = _find_keyword(s, "FROM")
    where_i = _find_keyword(s, "WHERE")
    group_i = _find_keyword(s, "GROUP BY")
    if sel_i != 0:
        raise CaggSQLError("declaration must start with SELECT (or CREATE ... AS SELECT)")
    if from_i == -1 or group_i == -1:
        raise CaggSQLError("declaration needs FROM and GROUP BY clauses")
    if not (sel_i < from_i < group_i) or (where_i != -1 and not from_i < where_i < group_i):
        raise CaggSQLError("clause order must be SELECT ... FROM ... [WHERE ...] GROUP BY ...")

    items = [_split_alias(it) for it in _split_top(s[sel_i + 6 : from_i])]
    names = [alias for _, alias in items]
    if len(set(names)) != len(names):
        raise CaggSQLError(f"duplicate select aliases: {names}")
    source_end = where_i if where_i != -1 else group_i
    source = s[from_i + 4 : source_end].strip()
    if not source.replace("_", "").replace(".", "").isalnum():
        raise CaggSQLError(f"FROM must name one table/view, got {source!r}")
    filt = s[where_i + 5 : group_i].strip() if where_i != -1 else None

    key_names: list[str] = []
    for ref in _split_top(s[group_i + 8 :]):
        if ref.isdigit():
            pos = int(ref)
            if not 1 <= pos <= len(items):
                raise CaggSQLError(f"GROUP BY position {pos} out of range")
            key_names.append(names[pos - 1])
        elif ref in names:
            key_names.append(ref)
        else:
            raise CaggSQLError(
                f"GROUP BY {ref!r} does not name a select item (aliases: {names})"
            )

    keys: dict[str, str] = {}
    aggs: dict[str, tuple] = {}
    adopt: dict[str, object] = {}
    for expr, alias in items:
        if alias in key_names:
            keys[alias] = expr
            continue
        call = _parse_call(expr)
        if call is None:
            raise CaggSQLError(
                f"{alias}: {expr!r} is neither grouped nor an aggregate call — "
                "every non-key item must be one call from the cagg algebra"
            )
        fn, args = call
        if fn == "rollup":
            if not 1 <= len(args) <= 2 or not args[0].replace("_", "").isalnum():
                raise CaggSQLError(f"{alias}: rollup(parent_agg[, q]) expected")
            adopt[alias] = (args[0], float(args[1])) if len(args) == 2 else args[0]
        else:
            aggs[alias] = _agg_spec(alias, fn, args)

    if source.lower() == "hourly":
        if adopt:
            raise CaggSQLError(
                "rollup() re-merges a PARENT VIEW's day-partial state — "
                "a view FROM hourly declares plain aggregates instead"
            )
        if not aggs:
            raise CaggSQLError("view declares no aggregates")
        return {"source": "hourly", "keys": keys, "aggs": aggs, "filter": filt}
    if aggs:
        bad = sorted(aggs)
        raise CaggSQLError(
            f"{bad}: a view over another view must use rollup(parent_agg) — "
            "its aggregates re-merge the parent's day-partial state, they are "
            "never recomputed from raw (TimescaleDB hierarchical-cagg rule)"
        )
    if not adopt:
        raise CaggSQLError("hierarchical view adopts no parent aggregates")
    return {"source": source, "keys": keys, "aggs": adopt, "filter": filt}


def create_continuous_aggregate(
    pipe,
    path: str,
    sql: str,
    *,
    parents: dict[str, ContinuousAggregate] | None = None,
    **cagg_kw,
) -> ContinuousAggregate:
    """Declare a view from SQL text. ``FROM hourly`` builds a
    `ContinuousAggregate` on `pipe`; ``FROM <name>`` resolves `name` in
    `parents` (a dict of versioned views) and builds the hierarchical
    child. Extra keyword args (versioned/retain_dropped/lease) pass
    through. The compiled spec is identical to the dict form, so a
    SQL-declared view refreshing over an existing dict-declared partials
    table is a noop, not a rebuild."""
    spec = parse_cagg_sql(sql)
    if spec["source"] == "hourly":
        return ContinuousAggregate(
            pipe, path, keys=spec["keys"], aggs=spec["aggs"],
            filter=spec["filter"], **cagg_kw,
        )
    parent = (parents or {}).get(spec["source"])
    if parent is None:
        raise CaggSQLError(
            f"FROM {spec['source']!r}: not 'hourly' and not in parents= "
            f"(known: {sorted(parents or {})})"
        )
    return parent.child(
        path, keys=spec["keys"], aggs=spec["aggs"],
        filter=spec["filter"], **cagg_kw,
    )
