"""Avro-style schema-evolution compatibility + the schema_hash
soundness fix (constraint PARAMETERS are part of the hash)."""

import pytest

from pyschema_ray import Integer, List, Record, Text, no_auto_store
from pyschema_ray.evolution import check_compatibility
from pyschema_ray.state.manifest import schema_hash


def _mk(name, **fields):
    cls = type(name, (Record,), dict(fields, _key_field="doc_id"))
    return no_auto_store(cls)


def test_identical_schemas_fully_compatible():
    a = _mk("A1", doc_id=Text(nullable=False), n=Integer(size=4))
    b = _mk("A2", doc_id=Text(nullable=False), n=Integer(size=4))
    rep = check_compatibility(a.fingerprint(), b.fingerprint())
    assert rep.full and not rep.changes and not rep.constraint_changes


def test_added_nullable_field_backward_ok():
    old = _mk("B1", doc_id=Text(nullable=False))
    new = _mk("B2", doc_id=Text(nullable=False), extra=Integer(size=8))
    rep = check_compatibility(old.fingerprint(), new.fingerprint())
    assert rep.backward and rep.full  # nullable add is fully compatible
    assert ("added", "extra", "nullable field added") in rep.changes


def test_added_required_field_breaks_backward():
    old = _mk("C1", doc_id=Text(nullable=False))
    new = _mk("C2", doc_id=Text(nullable=False),
              extra=Integer(size=8, nullable=False))
    rep = check_compatibility(old.fingerprint(), new.fingerprint())
    assert not rep.backward and rep.forward


def test_removed_required_field_breaks_forward():
    old = _mk("D1", doc_id=Text(nullable=False),
              extra=Integer(size=8, nullable=False))
    new = _mk("D2", doc_id=Text(nullable=False))
    rep = check_compatibility(old.fingerprint(), new.fingerprint())
    assert rep.backward and not rep.forward


def test_int_widening_promotes_backward_only():
    old = _mk("E1", doc_id=Text(nullable=False), n=Integer(size=4))
    new = _mk("E2", doc_id=Text(nullable=False), n=Integer(size=8))
    rep = check_compatibility(old.fingerprint(), new.fingerprint())
    assert rep.backward and not rep.forward  # int32 -> int64


def test_nullable_tightening_breaks_backward():
    old = _mk("F1", doc_id=Text(nullable=False), n=Integer(size=8))
    new = _mk("F2", doc_id=Text(nullable=False),
              n=Integer(size=8, nullable=False))
    rep = check_compatibility(old.fingerprint(), new.fingerprint())
    assert not rep.backward and rep.forward


def test_constraint_parameter_change_changes_hash_and_is_reported():
    """The resume-soundness fix: Range BOUNDS are part of the schema
    hash (same constraint name, different parameters => different
    hash), and the compat report lists the change."""
    old = _mk("G1", doc_id=Text(nullable=False),
              n=Integer(size=4, min=1, max=100))
    new = _mk("G2", doc_id=Text(nullable=False),
              n=Integer(size=4, min=1, max=200))
    assert schema_hash(old) != schema_hash(new)
    rep = check_compatibility(old.fingerprint(), new.fingerprint())
    assert rep.full  # read-compatible; verdicts differ though
    assert rep.constraint_changes  # the bound change is surfaced


def test_resume_refusal_includes_compat_summary(tmp_path, synth_corpus):
    from pyschema_ray.pipelines.validate import (PipelineConfig,
                                                 ValidationPipeline)
    from pyschema_ray.sources.synth import VOCAB

    def schema(maxtok):
        @no_auto_store
        class S(Record):
            doc_id = Text(nullable=False)
            tokens = List(Integer(size=4))
            n_tok = Integer(size=4, min=1, max=maxtok)
            source = Text()
            _key_field = "doc_id"
            _schema_name = "S"
        return S

    out = str(tmp_path / "run")
    cfg = PipelineConfig(schema_cls=schema(4096),
                         input_paths=synth_corpus["dir"], out_dir=out,
                         files_per_shard=4, check_unique=False)
    ValidationPipeline(cfg).run()

    cfg2 = PipelineConfig(schema_cls=schema(2048),
                          input_paths=synth_corpus["dir"], out_dir=out,
                          files_per_shard=4, check_unique=False)
    with pytest.raises(RuntimeError) as ei:
        ValidationPipeline(cfg2).run()
    msg = str(ei.value)
    assert "refusing to resume" in msg
    assert "schema change is fully compatible" in msg
    assert "range(n_tok)" in msg  # the changed constraint is named
