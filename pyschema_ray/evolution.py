"""Schema-evolution compatibility checking, Avro-style.

The reference exports Avro schemas (pyschema_extensions/avro.py); the
natural companion for a long-lived validation pipeline is the Avro
SCHEMA RESOLUTION rules (public Avro spec): can data written under an
OLD schema be read/validated under a NEW one (backward), and vice
versa (forward)?  This module answers that from two schema
fingerprints (Record.fingerprint() — the same JSON persisted in the
checkpoint manifest), so it works against a manifest written by a
prior run whose Record class no longer exists in code.

This is an ADVISORY surface: resume itself stays strict (identical
schema_hash — anything weaker can silently change verdicts on
already-validated shards, see ValidationPipeline), but the refusal
error now explains WHAT changed and whether the change is
read-compatible, which is the decision a user actually needs to make.
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: writer type -> reader types it may be promoted to (Avro spec
#: promotion chain, restricted to the types our Field model emits)
_PROMOTIONS = {
    "int32": {"int64", "float32", "float64"},
    "int64": {"float32", "float64"},
    "float32": {"float64"},
    "string": {"large_string"},
    "large_string": {"string"},
}


def _type_readable(writer: str, reader: str) -> bool:
    if writer == reader:
        return True
    return reader in _PROMOTIONS.get(writer, set())


@dataclass
class CompatReport:
    backward: bool = True   # NEW schema reads data written under OLD
    forward: bool = True    # OLD schema reads data written under NEW
    changes: list = field(default_factory=list)  # (kind, field, note)
    constraint_changes: list = field(default_factory=list)

    @property
    def full(self) -> bool:
        return self.backward and self.forward

    def summary(self) -> str:
        tag = ("fully compatible" if self.full else
               "backward-compatible only" if self.backward else
               "forward-compatible only" if self.forward else
               "incompatible")
        lines = [f"schema change is {tag}"]
        lines += [f"  [{k}] {f}: {n}" for k, f, n in self.changes]
        lines += [f"  [constraint] {n}" for n in self.constraint_changes]
        return "\n".join(lines)


def _fields_of(fp: dict) -> dict:
    return {f["name"]: f for f in fp["fields"]}


def _base_type(arrow: str) -> str:
    # Field.fingerprint's "arrow" is str(pa.DataType), e.g. "int32",
    # "list<item: int32>", "string"
    return arrow


def check_compatibility(old_fp: dict, new_fp: dict) -> CompatReport:
    """Avro-resolution compatibility between two Record fingerprints
    (pass ``Record.fingerprint()`` dicts, e.g. the one stored in a
    manifest vs the current class's).

    Rules (public Avro spec, adapted to this field model):

    * field added in NEW: backward requires it to be nullable (the
      reader fills nulls for data that lacks it); forward unaffected.
    * field removed in NEW: forward requires the OLD field to be
      nullable; backward unaffected.
    * type changed: compatible in a direction iff the writer type
      promotes to the reader type (int32->int64->float..., string
      width changes).
    * nullable False->True: loosening — backward OK, forward breaks
      (old strict reader may meet nulls written under the new schema).
      True->False: the mirror image.
    * constraint parameter changes never break READ compatibility but
      are listed separately: they change VERDICTS, which is why resume
      stays strict on the full fingerprint hash.
    """
    rep = CompatReport()
    old_fields = _fields_of(old_fp)
    new_fields = _fields_of(new_fp)

    for name, nf in new_fields.items():
        of = old_fields.get(name)
        if of is None:
            if not nf.get("nullable", True):
                rep.backward = False
                rep.changes.append(
                    ("added", name,
                     "non-nullable field added — old data lacks it"))
            else:
                rep.changes.append(("added", name, "nullable field added"))
            continue
        ot, nt = _base_type(of["arrow"]), _base_type(nf["arrow"])
        if ot != nt:
            back_ok = _type_readable(ot, nt)
            fwd_ok = _type_readable(nt, ot)
            rep.backward &= back_ok
            rep.forward &= fwd_ok
            rep.changes.append(
                ("type", name,
                 f"{ot} -> {nt} (backward {'ok' if back_ok else 'BREAKS'}, "
                 f"forward {'ok' if fwd_ok else 'BREAKS'})"))
        if of.get("nullable", True) != nf.get("nullable", True):
            if nf.get("nullable", True):
                rep.forward = False
                rep.changes.append(
                    ("nullable", name,
                     "False -> True: old strict reader breaks (forward)"))
            else:
                rep.backward = False
                rep.changes.append(
                    ("nullable", name,
                     "True -> False: old nulls violate (backward)"))

    for name, of in old_fields.items():
        if name not in new_fields:
            if not of.get("nullable", True):
                rep.forward = False
                rep.changes.append(
                    ("removed", name,
                     "non-nullable field removed — new data lacks it "
                     "for old readers"))
            else:
                rep.changes.append(("removed", name,
                                    "nullable field removed"))

    def _cset(fp):
        out = set()
        for c in fp.get("constraints", []):
            if isinstance(c, dict):
                out.add((c["name"], c.get("detail", "")))
            else:  # legacy manifests: names only
                out.add((c, ""))
        return out

    oc, nc = _cset(old_fp), _cset(new_fp)
    for cname, cdetail in sorted(oc - nc):
        rep.constraint_changes.append(f"dropped/changed: {cname}"
                                      + (f" ({cdetail})" if cdetail else ""))
    for cname, cdetail in sorted(nc - oc):
        rep.constraint_changes.append(f"added/changed: {cname}"
                                      + (f" ({cdetail})" if cdetail else ""))
    return rep
