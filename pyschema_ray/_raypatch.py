"""Driver-side compatibility shim for a Ray 2.49.2 schema-tracking gap.

Every Ray Data map task must emit at least one block, even when its
input partition is empty (``output_buffer.py``:
``has_next() -> not self._returned_at_least_one_block`` after
finalize), and empty input blocks never reach the UDF at all
(``batcher.py``: "Note empty block is not added to buffer").  A map /
``map_groups`` task over an empty shuffle partition therefore always
fabricates a SCHEMA-LESS empty block — nothing a UDF can do prevents
it, because the UDF is never called.

The streaming executor's per-operator schema tracker
(``streaming_executor_state.dedupe_schemas_with_validation``) special-
cases an empty OLD schema but not an empty NEW one, so each fabricated
empty bundle logs "Operator produced a RefBundle with a different
schema ... PandasBlockSchema(names=[])" even though Ray itself then
relabels the bundle with the stream schema and every downstream
batcher drops the empty block unread.  Empty shuffle partitions are
routine for this engine's integer key-shard exchanges whenever the
shard-key cardinality drops below the partition count (small inputs,
high CPU counts), so the spurious warning drowns out real divergence
signals.

:func:`install` wraps the function with the missing symmetric check:
a bundle whose own schema is EMPTY is relabeled with the stream schema
and reported as non-diverging (exactly what the unpatched code already
does to the bundle — minus the false warning).  Genuine divergence
(two non-empty, different schemas) still warns.  The patch is a no-op
on Ray versions where the symbol moved or the gap is fixed.
"""

from __future__ import annotations

_installed = False


def install() -> bool:
    """Idempotently install the shim; returns True when active."""
    global _installed
    if _installed:
        return True
    try:
        from ray.data._internal.execution import streaming_executor_state as ses
        from ray.data.block import _is_empty_schema
        from ray.data._internal.execution.interfaces import RefBundle
        original = ses.dedupe_schemas_with_validation
    except (ImportError, AttributeError):
        return False

    def dedupe_schemas_with_validation(old_schema, bundle, warn=True,
                                       enforce_schemas=False):
        if not _is_empty_schema(old_schema) \
                and _is_empty_schema(bundle.schema):
            # fabricated empty block from a zero-output map task:
            # relabel with the stream schema, no divergence
            return (
                RefBundle(
                    bundle.blocks,
                    schema=old_schema,
                    owns_blocks=bundle.owns_blocks,
                    output_split_idx=bundle.output_split_idx,
                    _cached_object_meta=bundle._cached_object_meta,
                    _cached_preferred_locations=(
                        bundle._cached_preferred_locations),
                ),
                False,
            )
        return original(old_schema, bundle, warn=warn,
                        enforce_schemas=enforce_schemas)

    ses.dedupe_schemas_with_validation = dedupe_schemas_with_validation
    _install_unify_hash_fix()
    _install_pandas_meta_strip()
    _installed = True
    return True


def _install_pandas_meta_strip() -> bool:
    """Strip the ``b'pandas'`` schema metadata that
    ``pa.Table.from_pandas`` attaches when Ray converts a pandas block
    to Arrow (``PandasBlockAccessor.to_arrow``).  That metadata makes
    the schema unhashable (see :func:`_install_unify_hash_fix`) and
    tells downstream nothing — Ray rebuilds pandas frames
    column-by-column and never consults it.  Patching the conversion
    is worker-effective: the conversion always runs inside the task
    that executes one of our UDFs, and unpickling the UDF imports this
    package, which installs the patch."""
    try:
        from ray.data._internal.pandas_block import PandasBlockAccessor
        original = PandasBlockAccessor.to_arrow
    except (ImportError, AttributeError):
        return False
    if getattr(original, "__psr_patched__", False):
        return True

    def to_arrow(self):
        t = original(self)
        if t.schema.metadata:
            t = t.replace_schema_metadata(None)
        return t

    to_arrow.__psr_patched__ = True
    PandasBlockAccessor.to_arrow = to_arrow
    return True


def _install_unify_hash_fix() -> bool:
    """Ray's ``unify_schemas`` dedupes input schemas via ``set(...)``,
    but ``hash(pa.Schema)`` raises ``unhashable type: 'dict'`` whenever
    the schema carries key-value metadata (pyarrow 16.1) — and every
    Arrow block converted from a pandas ``map_groups`` output carries
    ``b'pandas'`` metadata.  Each shuffle-reduce over such blocks then
    logs "Failed to hash the schemas (for deduplication)" and skips the
    early exit.  Stripping metadata before unification restores both
    the silence and the fast path; the metadata is block-lineage trivia
    Ray never reads."""
    try:
        from ray.data._internal.arrow_ops import transform_pyarrow as tp
        original = tp.unify_schemas
    except (ImportError, AttributeError):
        return False
    if getattr(original, "__psr_patched__", False):
        return True

    def unify_schemas(schemas, *, promote_types=False):
        schemas = [s.remove_metadata()
                   if getattr(s, "metadata", None) else s
                   for s in schemas]
        return original(schemas, promote_types=promote_types)

    unify_schemas.__psr_patched__ = True
    tp.unify_schemas = unify_schemas
    return True
