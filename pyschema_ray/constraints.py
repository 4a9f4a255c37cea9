"""Vectorized constraint DSL.

Each :class:`Constraint` compiles a per-field rule (the reference checks
these value-at-a-time inside ``Field.load``, pyschema/types.py) into a
whole-column Arrow predicate: ``mask(table) -> pyarrow.BooleanArray``
with **True = valid**.  Nulls are governed only by :class:`NotNull`;
every other constraint treats null input values as valid (so a null
``doc_id`` yields exactly one violation row, not one per constraint —
this ordering/semantics is frozen for violation-row parity).

Constraint *names* and *detail* strings are frozen, deterministic
strings — the oracle validator in ``tests/`` must reproduce them
byte-for-byte (SURVEY.md §7 hard part 2).

Extension surface (the analog of the reference's ``Field.mixin`` +
Field subclassing, pyschema/core.py): subclass :class:`Constraint` and
register with :func:`register_constraint`, or use :class:`Custom` with a
plain ``fn(pa.Table) -> BooleanArray`` — the vectorized analog of a
pyschema custom validator.
"""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: registry: constraint-kind name -> class (plugin surface)
CONSTRAINT_REGISTRY: dict[str, type] = {}


def register_constraint(cls):
    CONSTRAINT_REGISTRY[cls.__name__] = cls
    return cls


def as_warning(constraint):
    """Downgrade a constraint to warning severity: its violation rows
    and counts are still recorded everywhere (reports, manifest,
    violation parquet), but they no longer fail partition / shard /
    run verdicts — the observe-first rollout mode for a new rule.
    Returns the constraint for inline use in ``_extra_constraints``.

    Severity is keyed by the FROZEN NAME in every verdict
    computation: two constraints sharing a name (e.g. two Range
    rules on the same column) share one severity — give rules you
    need to grade differently distinguishable names."""
    constraint.severity = "warning"
    return constraint


def _true_for_null(mask, col) -> pa.ChunkedArray | pa.Array:
    """Nulls are valid for non-NotNull constraints; also maps the null
    results of Arrow comparisons on null inputs to True."""
    return pc.fill_null(pc.or_kleene(mask, pc.is_null(col)), True)


def _col(table: pa.Table, path: str):
    """Resolve a (possibly dotted) column path: ``'a.b'`` reads struct
    field ``b`` of column ``a`` via ``pc.struct_field`` — the
    vectorized access for SubRecord-nested constraints.  A null parent
    struct yields null children (which non-NotNull constraints treat
    as valid, matching the row path's skip-children-of-null-record
    semantics)."""
    if "." not in path:
        return table[path]
    parts = path.split(".")
    col = table[parts[0]]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    for p in parts[1:]:
        col = pc.struct_field(col, p)
    return col


class Constraint:
    """Base.  ``name`` is the frozen identifier that appears in
    violation rows and the manifest; ``detail`` the frozen human string.

    Column-pruning protocol: a subclass whose ``mask`` reads columns
    declares them either through the ``column`` / ``list_column``
    attribute convention (the built-ins) or by defining
    ``required_columns() -> Iterable[str]``.  A constraint declaring
    neither disables column-pruned reads for the whole validator
    (CompiledValidator.read_columns) — safe but slower."""

    name: str = "?"
    detail: str = ""
    #: "error" (default) fails the partition/run verdict; "warning"
    #: records violation rows + counts but never flips a verdict.
    severity: str = "error"

    def mask(self, table: pa.Table):  # pragma: no cover - abstract
        """Return BooleanArray/ChunkedArray, True where the row is valid."""
        raise NotImplementedError

    def rebind(self, prefix: str) -> "Constraint":
        """Copy of this constraint with its column path(s) prefixed
        (``'inner' -> 'parent.inner'``) — how SubRecord hoists its
        record class's field constraints into vectorized dotted-path
        checks.  Name/detail strings are rewritten on the first
        STANDALONE occurrence of each path (token-bounded, and for
        ``kind(args)``-shaped names only inside the parentheses), so a
        short column name like ``'n'`` can never hit the ``not_null``
        kind prefix: the frozen id stays ``not_null(parent.n)``."""
        import copy
        import re
        c = copy.copy(self)

        def rewrite(s: str, old: str, new: str, in_args: bool) -> str:
            # token-bounded: not inside a word or another dotted path
            pat = re.compile(rf"(?<![\w.]){re.escape(old)}(?![\w.])")
            if in_args and "(" in s:
                i = s.index("(") + 1
                return s[:i] + pat.sub(new, s[i:], count=1)
            return pat.sub(new, s, count=1)

        for attr in ("column", "list_column", "other_column"):
            old = getattr(c, attr, None)
            if old is None:
                continue
            new = f"{prefix}.{old}"
            setattr(c, attr, new)
            c.name = rewrite(c.name, old, new, in_args=True)
            c.detail = rewrite(c.detail, old, new, in_args=False)
        return c

    def __repr__(self):
        return f"<{type(self).__name__} {self.name}>"


@register_constraint
class NotNull(Constraint):
    def __init__(self, column: str):
        self.column = column
        self.name = f"not_null({column})"
        self.detail = f"{column} is null"

    def mask(self, table):
        m = pc.is_valid(_col(table, self.column))
        if "." in self.column:
            # a null parent record is governed by the PARENT's own
            # not_null; its absent children are not violations (the
            # row path never descends into a null record)
            parent = _col(table, self.column.rsplit(".", 1)[0])
            m = pc.or_(m, pc.is_null(parent))
        return m


@register_constraint
class Regex(Constraint):
    """Value must match (search semantics) the regex.  Uses Arrow's RE2
    engine; keep patterns in the RE2-compatible subset so the oracle's
    ``re.search`` agrees."""

    def __init__(self, column: str, pattern: str):
        self.column = column
        self.pattern = pattern
        self.name = f"regex({column})"
        self.detail = f"{column} !~ /{pattern}/"

    def mask(self, table):
        m = pc.match_substring_regex(_col(table, self.column), self.pattern)
        return _true_for_null(m, _col(table, self.column))


@register_constraint
class Range(Constraint):
    """Inclusive [min, max] bounds on a numeric column."""

    def __init__(self, column: str, min=None, max=None):  # noqa: A002
        self.column = column
        self.min = min
        self.max = max
        self.name = f"range({column})"
        self.detail = f"{column} not in [{min}, {max}]"

    def mask(self, table):
        col = _col(table, self.column)
        m = None
        if self.min is not None:
            m = pc.greater_equal(col, self.min)
        if self.max is not None:
            hi = pc.less_equal(col, self.max)
            m = hi if m is None else pc.and_kleene(m, hi)
        return _true_for_null(m, col)


@register_constraint
class InSet(Constraint):
    """Closed value domain (enum membership / local referential check)."""

    def __init__(self, column: str, values: Iterable):
        self.column = column
        self.values = list(values)
        self.name = f"in_set({column})"
        self.detail = f"{column} not in declared domain"
        self._value_set = pa.array(self.values)

    def mask(self, table):
        m = pc.is_in(_col(table, self.column), value_set=self._value_set)
        # is_in returns False (not null) for null inputs; still normalize
        return _true_for_null(m, _col(table, self.column))


@register_constraint
class Utf8Length(Constraint):
    def __init__(self, column: str, min_length=None, max_length=None):
        self.column = column
        self.min_length = min_length
        self.max_length = max_length
        self.name = f"utf8_length({column})"
        self.detail = f"len({column}) not in [{min_length}, {max_length}]"

    def mask(self, table):
        n = pc.utf8_length(_col(table, self.column))
        m = None
        if self.min_length is not None:
            m = pc.greater_equal(n, self.min_length)
        if self.max_length is not None:
            hi = pc.less_equal(n, self.max_length)
            m = hi if m is None else pc.and_kleene(m, hi)
        return _true_for_null(m, _col(table, self.column))


@register_constraint
class ListLength(Constraint):
    def __init__(self, column: str, min_items=None, max_items=None):
        self.column = column
        self.min_items = min_items
        self.max_items = max_items
        self.name = f"list_length({column})"
        self.detail = f"len({column}) not in [{min_items}, {max_items}]"

    def mask(self, table):
        n = pc.list_value_length(_col(table, self.column))
        m = None
        if self.min_items is not None:
            m = pc.greater_equal(n, self.min_items)
        if self.max_items is not None:
            hi = pc.less_equal(n, self.max_items)
            m = hi if m is None else pc.and_kleene(m, hi)
        return _true_for_null(m, _col(table, self.column))


@register_constraint
class LengthEquals(Constraint):
    """int column must equal the list length of another column
    (``n_tok == len(tokens)``).  Null on either side -> valid (covered
    by the NotNull constraints)."""

    def __init__(self, column: str, list_column: str):
        self.column = column
        self.list_column = list_column
        self.name = f"length_eq({column},{list_column})"
        self.detail = f"{column} != len({list_column})"

    def mask(self, table):
        n = pc.list_value_length(_col(table, self.list_column))
        m = pc.equal(pc.cast(_col(table, self.column), pa.int64()),
                     pc.cast(n, pa.int64()))
        m = _true_for_null(m, _col(table, self.column))
        return pc.fill_null(pc.or_kleene(m, pc.is_null(_col(table, self.list_column))), True)


@register_constraint
class ElementRange(Constraint):
    """Every element of a list column must lie in the half-open range
    [min, max).  Fully vectorized: flatten the list buffer once, compare,
    and reduce per row via offset-sliced cumulative sums — no per-row
    Python loop (SURVEY.md §7 hard part 4)."""

    def __init__(self, column: str, min=None, max=None):  # noqa: A002
        self.column = column
        self.min = min
        self.max = max
        self.name = f"element_range({column})"
        self.detail = f"{self.column} has element outside [{min}, {max})"

    def mask(self, table):
        col = _col(table, self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if isinstance(col, pa.ChunkedArray):  # zero-chunk edge
            col = pa.array([], type=col.type) if col.num_chunks == 0 else col.chunk(0)
        # offsets of the (possibly sliced) ListArray, normalized to the
        # values buffer coordinates
        offsets = np.asarray(col.offsets, dtype=np.int64)
        n_rows = len(col)
        if n_rows == 0:
            return pa.array(np.ones(0, dtype=bool))
        # CRITICAL for batched execution: ``col.values`` of a *sliced*
        # ListArray is the FULL child array; restrict to this slice's
        # value range or per-batch work becomes O(block), i.e. quadratic
        # over the file
        lo_idx = int(offsets[0])
        hi_idx = int(offsets[-1])
        offsets = offsets - lo_idx
        values = col.values.slice(lo_idx, hi_idx - lo_idx)
        # zero-copy in the common no-null case (native int/float dtype);
        # nulls force the float64+NaN conversion path
        vnp = values.to_numpy(zero_copy_only=not values.null_count) \
            if not values.null_count \
            else np.asarray(values.to_numpy(zero_copy_only=False),
                            dtype=np.float64)
        if self.min is not None and self.max is not None:
            bad = (vnp < self.min) | (vnp >= self.max)
        elif self.min is not None:
            bad = vnp < self.min
        else:
            bad = vnp >= self.max
        if values.null_count:
            bad &= np.asarray(pc.is_valid(values))  # null elements: skip
        # out-of-range elements are defect-rate sparse: locate them and
        # map value index -> row via searchsorted instead of a full
        # cumsum over every element
        valid = np.ones(n_rows, dtype=bool)
        bad_idx = np.nonzero(bad)[0]
        if bad_idx.size:
            rows = np.searchsorted(offsets, bad_idx, side="right") - 1
            valid[rows] = False
        if col.null_count:
            valid |= ~np.asarray(pc.is_valid(col))  # null list -> valid here
        return pa.array(valid)


def _map_parts(col):
    """(MapArray, rebased offsets, keys-slice, items-slice) of a
    possibly chunked / sliced map column — the ``.values``-rebase rule
    (ElementRange) applies to map children identically."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # zero-chunk edge
        col = pa.array([], type=col.type) if col.num_chunks == 0 \
            else col.chunk(0)
    offsets = np.asarray(col.offsets, dtype=np.int64)
    if len(col) == 0:
        empty = pa.array([], type=pa.string())
        return col, offsets, empty, empty
    lo, hi = int(offsets[0]), int(offsets[-1])
    return (col, offsets - lo,
            col.keys.slice(lo, hi - lo), col.items.slice(lo, hi - lo))


def _per_row_counts(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Count of True child slots per row (cumsum-diff — robust to
    empty rows, unlike reduceat)."""
    c = np.zeros(len(mask) + 1, dtype=np.int64)
    np.cumsum(mask, out=c[1:])
    return c[offsets[1:]] - c[offsets[:-1]]


@register_constraint
class MapRequiredKeys(Constraint):
    """Every non-null map must contain ALL of ``keys``.  Vectorized:
    one equality scan over the flattened key child per required key,
    reduced per row via cumulative counts — no per-row Python."""

    def __init__(self, column: str, keys):
        self.column = column
        self.keys = sorted(keys)
        self.name = f"map_required_keys({column})"
        self.detail = f"{column} missing required key(s) {self.keys}"

    def mask(self, table):
        col = _col(table, self.column)
        col, offsets, keys, _ = _map_parts(col)
        n = len(col)
        if n == 0:
            return pa.array(np.ones(0, dtype=bool))
        valid = np.ones(n, dtype=bool)
        for k in self.keys:
            present = np.asarray(pc.fill_null(pc.equal(keys, k), False)) \
                if len(keys) else np.zeros(0, dtype=bool)
            valid &= _per_row_counts(present, offsets) > 0
        if col.null_count:
            valid |= ~np.asarray(pc.is_valid(col))  # null map: NotNull's job
        return pa.array(valid)


@register_constraint
class MapValueRange(Constraint):
    """Every map VALUE must lie in the half-open range [min, max);
    null values are skipped (Range semantics).  Same flatten + rebase
    + sparse row mapping as ElementRange, over the items child."""

    def __init__(self, column: str, min=None, max=None):  # noqa: A002
        self.column = column
        self.min = min
        self.max = max
        self.name = f"map_value_range({column})"
        self.detail = f"{column} has map value outside [{min}, {max})"

    def mask(self, table):
        col = _col(table, self.column)
        col, offsets, _, items = _map_parts(col)
        n = len(col)
        if n == 0:
            return pa.array(np.ones(0, dtype=bool))
        vnp = items.to_numpy(zero_copy_only=not items.null_count) \
            if not items.null_count \
            else np.asarray(items.to_numpy(zero_copy_only=False),
                            dtype=np.float64)
        if self.min is not None and self.max is not None:
            bad = (vnp < self.min) | (vnp >= self.max)
        elif self.min is not None:
            bad = vnp < self.min
        else:
            bad = vnp >= self.max
        if items.null_count:
            bad &= np.asarray(pc.is_valid(items))
        valid = np.ones(n, dtype=bool)
        bad_idx = np.nonzero(bad)[0]
        if bad_idx.size:
            rows = np.searchsorted(offsets, bad_idx, side="right") - 1
            valid[rows] = False
        if col.null_count:
            valid |= ~np.asarray(pc.is_valid(col))
        return pa.array(valid)


@register_constraint
class ColumnCompare(Constraint):
    """Cross-column row predicate: ``column <op> other_column`` with
    ``op`` in {lt, le, gt, ge, eq, ne} — the consistency-check shape
    (``start_ts <= end_ts``, ``n_used <= n_total``) that single-column
    constraints cannot express.  Null on EITHER side -> valid (null
    policy belongs to the NotNull constraints, the LengthEquals
    convention).  Arrow comparison kernels handle numeric, temporal
    and string columns alike."""

    _OPS = {"lt": "less", "le": "less_equal", "gt": "greater",
            "ge": "greater_equal", "eq": "equal", "ne": "not_equal"}
    _SYM = {"lt": "<", "le": "<=", "gt": ">", "ge": ">=",
            "eq": "==", "ne": "!="}

    def __init__(self, column: str, op: str, other_column: str):
        if op not in self._OPS:
            raise ValueError(f"op must be one of {sorted(self._OPS)}, "
                             f"got {op!r}")
        self.column = column
        self.op = op
        self.other_column = other_column
        self.name = f"col_cmp({column} {self._SYM[op]} {other_column})"
        self.detail = (f"{column} not {self._SYM[op]} {other_column}")

    def required_columns(self):
        return [self.column, self.other_column]

    def mask(self, table):
        a = _col(table, self.column)
        b = _col(table, self.other_column)
        m = getattr(pc, self._OPS[self.op])(a, b)
        m = pc.or_kleene(m, pc.is_null(a))
        m = pc.or_kleene(m, pc.is_null(b))
        return pc.fill_null(m, True)


@register_constraint
class Conditional(Constraint):
    """IF/THEN rule: the inner constraint is enforced only on rows
    matching the guard predicate ``column <op> value``; rows that
    don't match the guard are vacuously valid — the conditional
    schema shape (IF source='s0' THEN n_tok <= 2048) no row-uniform
    constraint can express.

    Guard semantics are STRICT SQL WHERE semantics: a null guard
    column never matches (the violation set is ``guard AND NOT
    inner``, so a null guard row cannot violate) — unlike constraint
    masks, where null is valid.  The inner constraint keeps its own
    null contract.

    ``op``: eq, ne, lt, le, gt, ge, isin (value = iterable).  If the
    inner constraint declares no columns (e.g. Custom), pass
    ``columns=[...]`` explicitly or construction fails rather than
    silently breaking column-pruned reads."""

    _OPS = {"eq": "equal", "ne": "not_equal", "lt": "less",
            "le": "less_equal", "gt": "greater",
            "ge": "greater_equal"}
    _SYM = {"eq": "==", "ne": "!=", "lt": "<", "le": "<=",
            "gt": ">", "ge": ">=", "isin": "in"}

    def __init__(self, column: str, op: str, value,
                 then: Constraint, columns: list[str] | None = None):
        if op not in self._SYM:
            raise ValueError(f"op must be one of {sorted(self._SYM)}, "
                             f"got {op!r}")
        self.column = column
        self.op = op
        self.value = value
        self.then = then
        inner_cols = self._inner_columns(then)
        if inner_cols is None and columns is None:
            raise ValueError(
                "inner constraint declares no columns; pass "
                "columns=[...] so pruned reads stay safe")
        self._extra_cols = list(columns or inner_cols)
        self._compose_strings()

    @staticmethod
    def _inner_columns(c: Constraint):
        req = getattr(c, "required_columns", None)
        if callable(req):
            return list(req())
        declared = [getattr(c, a, None)
                    for a in ("column", "list_column", "other_column")]
        cols = [v for v in declared if v is not None]
        return cols or None

    def _compose_strings(self):
        v = self.value
        vs = f"{{{len(v)} values}}" if self.op == "isin" else repr(v)
        self.name = (f"if({self.column} {self._SYM[self.op]} {vs})"
                     f"then({self.then.name})")
        self.detail = (f"rows where {self.column} "
                       f"{self._SYM[self.op]} {vs} violate: "
                       f"{self.then.detail}")

    def required_columns(self):
        return [self.column, *self._extra_cols]

    def rebind(self, prefix: str) -> "Conditional":
        import copy
        c = copy.copy(self)
        c.column = f"{prefix}.{self.column}"
        c.then = self.then.rebind(prefix)
        c._extra_cols = [f"{prefix}.{x}" for x in self._extra_cols]
        c._compose_strings()
        return c

    def mask(self, table):
        col = _col(table, self.column)
        if self.op == "isin":
            guard = pc.is_in(col, value_set=pa.array(list(self.value)))
        else:
            guard = getattr(pc, self._OPS[self.op])(col, self.value)
        guard = pc.fill_null(guard, False)   # strict: null never matches
        inner = pc.fill_null(self.then.mask(table), True)
        return pc.or_kleene(pc.invert(guard), inner)


@register_constraint
class Custom(Constraint):
    """Escape hatch: arbitrary vectorized validator
    ``fn(pa.Table) -> BooleanArray`` (True = valid) — the analog of a
    pyschema custom validator, but batch-at-a-time."""

    def __init__(self, name: str, fn: Callable[[pa.Table], "pa.Array"],
                 detail: str | None = None):
        self.name = f"custom({name})"
        self.fn = fn
        self.detail = detail or f"custom validator {name} failed"

    def mask(self, table):
        # Frozen null contract (module docstring): nulls are valid for
        # every constraint except NotNull.  Arrow comparison kernels
        # yield null on null input, so normalize the user expression's
        # mask the same way the built-ins do — otherwise a custom check
        # over a nullable column would flag nulls the SQL oracle (where
        # NULL predicates are not selected) does not.
        return pc.fill_null(self.fn(table), True)


# -- global constraints (need a shuffle / broadcast; evaluated by their own
#    pipeline stages, not inside the per-batch validator) -------------------

class Unique(Constraint):
    """Global exact uniqueness; evaluated by stages/unique.py via a
    groupby-aggregate hash shuffle on the key column."""

    def __init__(self, column: str):
        self.column = column
        self.name = f"unique({column})"
        self.detail = f"{column} duplicated"

    def mask(self, table):  # not a per-batch constraint
        raise TypeError("Unique is evaluated by the uniqueness stage")


class Referential(Constraint):
    """Membership of ``column`` in a broadcast dimension table's column.
    Evaluated per batch against the broadcast value set (never a shuffle
    join): stages/validator.py binds the dim values at compile time."""

    def __init__(self, column: str, dim_name: str, dim_column: str,
                 values: Iterable):
        self.column = column
        self.name = f"ref({column}->{dim_name}.{dim_column})"
        self.detail = f"{column} not present in {dim_name}.{dim_column}"
        self._value_set = pa.array(sorted(set(values)))

    def mask(self, table):
        m = pc.is_in(_col(table, self.column), value_set=self._value_set)
        return _true_for_null(m, _col(table, self.column))
