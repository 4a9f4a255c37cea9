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
    _installed = True
    return True
