"""OTLP profiles wire format — protobuf AND JSON codecs for the pprofile
DICTIONARY-ENCODED hierarchy, completing the wire story for the fourth
signal (analytic side: sources/profiles.py). With this module every
signal has both wire forms (logs/spans/metrics/profiles × proto/JSON).

Field numbers mirror the generated marshalers exactly (tags verified
against the 0x.. constants in each MarshalProto):

    ProfilesData:       resource_profiles=1  dictionary=2
                        (``generated_proto_profilesdata.go:191-197``)
    ResourceProfiles:   resource=1  scope_profiles=2  schema_url=3
    ScopeProfiles:      scope=1  profiles=2  schema_url=3
    Profile:            sample_type=1(ValueType) samples=2
                        time_unix_nano=3(I64) duration_nano=4(varint)
                        period_type=5 period=6 profile_id=7(bytes)
                        dropped=8 original_payload_format=9
                        original_payload=10 attribute_indices=11(packed)
                        (``generated_proto_profile.go:307-385``)
    Sample:             stack_index=1 attribute_indices=2(packed)
                        link_index=3 values=4(packed varint)
                        timestamps_unix_nano=5(packed fixed64)
    ProfilesDictionary: mapping_table=1 location_table=2
                        function_table=3 link_table=4 string_table=5
                        attribute_table=6 stack_table=7
    Function:           name_strindex=1 system_name_strindex=2
                        filename_strindex=3 start_line=4
    Stack:              location_indices=1(packed varint)
    Location:           mapping_index=1 address=2 line=3(Line)
                        attribute_indices=4
    Line:               function_index=1 line=2 column=3
    ValueType:          type_strindex=1 unit_strindex=2

Dictionary conventions follow pprofile: index 0 of every table is the
empty sentinel (string_table[0] == "", zero Function/Location/Stack), so
proto-default 0 indices are unambiguous; real entries start at 1.

The engine's analytic profile model (sources/profiles.py: 3-frame stacks
as function-table indices, value_us per sample) maps onto the wire as:
each distinct (f0, f1, f2) stack becomes one Stack of three Locations
(each Location one Line → Function), samples carry [value_us] with
sample_type (samples, us). Decode returns the dictionary tables plus a
flat samples table — ``decoded_top_functions`` re-derives the per-name
rollup for parity checks against the analytic ``top_functions``.

This is a WIRE CODEC (per-record Python, like the reference's generated
marshalers); bulk analytics use Parquet.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .otlp_proto import (_LEN, _VARINT, _decode_packed_varints,
                         _iter_fields, _len_field, _packed_varints,
                         _str_field, _tag, _varint)


def _valuetype(type_idx: int, unit_idx: int) -> bytes:
    out = b""
    if type_idx:
        out += _tag(1, _VARINT) + _varint(type_idx)
    if unit_idx:
        out += _tag(2, _VARINT) + _varint(unit_idx)
    return out


def _function(name_idx: int) -> bytes:
    return (_tag(1, _VARINT) + _varint(name_idx)) if name_idx else b""


def _location(function_index: int) -> bytes:
    line = (_tag(1, _VARINT) + _varint(function_index)) \
        if function_index else b""
    return _len_field(3, line)


def _stack(location_indices) -> bytes:
    if not location_indices:
        return b""
    return _len_field(1, _packed_varints(location_indices))


def _sample(stack_index: int, values, timestamps=()) -> bytes:
    out = b""
    if stack_index:
        out += _tag(1, _VARINT) + _varint(stack_index)
    if values:
        out += _len_field(4, _packed_varints(values))
    if timestamps:
        out += _len_field(5, b"".join(struct.pack("<Q", int(t))
                                      for t in timestamps))
    return out


def encode_profiles_request(function_table: pa.Table, samples: pa.Table,
                            sample_type: str = "samples",
                            sample_unit: str = "us") -> bytes:
    """(func_id, name) dictionary + (f0_id, f1_id, f2_id, value_us)
    samples → one ExportProfilesServiceRequest/ProfilesData blob.

    func_ids are the analytic dictionary's DENSE ids
    (profiles.build_function_table); the wire shifts everything by +1 for
    the zero-sentinel convention. Stacks are leaf-LAST location lists
    (f0 root … f2 leaf — the flame_edges orientation)."""
    names = function_table.column("name").to_pylist()
    fids = function_table.column("func_id").to_pylist()
    dense = {int(f): i for i, f in enumerate(fids)}
    # string table: sentinel + type/unit + names
    strings = ["", sample_type, sample_unit] + list(names)
    name_stridx = {i: 3 + i for i in range(len(names))}

    f0 = samples.column("f0_id").to_numpy(zero_copy_only=False)
    f1 = samples.column("f1_id").to_numpy(zero_copy_only=False)
    f2 = samples.column("f2_id").to_numpy(zero_copy_only=False)
    vals = samples.column("value_us").to_numpy(zero_copy_only=False)
    stacks = np.stack([f0, f1, f2], axis=1)
    uniq, stack_of_sample = np.unique(stacks, axis=0, return_inverse=True) \
        if len(stacks) else (np.empty((0, 3), np.int64),
                             np.empty(0, np.int64))

    # dictionary: functions[i+1] = dense function i; locations mirror
    # functions 1:1 (loc j+1 → function j+1); stacks list locations
    func_msgs = b"".join(
        _len_field(3, _function(name_stridx[i]))
        for i in range(len(names)))
    loc_msgs = b"".join(
        _len_field(2, _location(i + 1)) for i in range(len(names)))
    stack_msgs = b"".join(
        _len_field(7, _stack([dense[int(a)] + 1, dense[int(b)] + 1,
                              dense[int(c)] + 1]))
        for a, b, c in uniq)
    dictionary = (
        _len_field(1, b"")            # mapping_table[0] sentinel
        + _len_field(2, b"") + loc_msgs      # location sentinel + real
        + _len_field(3, b"") + func_msgs     # function sentinel + real
        + b"".join(_str_field(5, s) if s else _len_field(5, b"")
                   for s in strings)
        + _len_field(7, b"") + stack_msgs)   # stack sentinel + real

    sample_msgs = b"".join(
        _len_field(2, _sample(int(si) + 1, [int(v)]))
        for si, v in zip(stack_of_sample, vals))
    profile = (_len_field(1, _valuetype(1, 2))  # sample_type (type, unit)
               + sample_msgs)
    scope_profiles = (_len_field(1, _str_field(1, "otelcol_ray"))
                      + _len_field(2, profile))
    resource_profiles = _len_field(1, b"") + _len_field(2, scope_profiles)
    return _len_field(1, resource_profiles) + _len_field(2, dictionary)


def decode_profiles_request(buf: bytes) -> dict:
    """ProfilesData bytes → dictionary tables + flat samples:

    {"strings": list[str],
     "functions": pa.Table (func_idx, name),         # wire indices
     "stacks":    pa.Table (stack_idx, func_idxs list<int64>),
     "samples":   pa.Table (stack_idx, value)}"""
    strings: list[str] = []
    functions: list[int] = []          # name_strindex per function entry
    locations: list[int] = []          # function_index per location entry
    stacks: list[list[int]] = []       # location indices per stack entry
    sample_rows: list[tuple[int, int]] = []

    def walk_dictionary(b: bytes) -> None:
        for f, w, v in _iter_fields(b):
            if f == 2:      # Location
                fn = 0
                for f2, w2, v2 in _iter_fields(bytes(v)):
                    if f2 == 3:  # Line
                        for f3, w3, v3 in _iter_fields(bytes(v2)):
                            if f3 == 1:
                                fn = v3
                locations.append(fn)
            elif f == 3:    # Function
                nm = 0
                for f2, w2, v2 in _iter_fields(bytes(v)):
                    if f2 == 1:
                        nm = v2
                functions.append(nm)
            elif f == 5:    # string table entry
                strings.append(bytes(v).decode())
            elif f == 7:    # Stack
                idxs: list[int] = []
                for f2, w2, v2 in _iter_fields(bytes(v)):
                    if f2 == 1:
                        idxs.extend(_decode_packed_varints(bytes(v2)))
                stacks.append(idxs)

    def walk_profile(b: bytes) -> None:
        for f, w, v in _iter_fields(b):
            if f == 2:      # Sample
                si = 0
                vals: list[int] = []
                for f2, w2, v2 in _iter_fields(bytes(v)):
                    if f2 == 1:
                        si = v2
                    elif f2 == 4:
                        if w2 == _LEN:
                            vals.extend(_decode_packed_varints(bytes(v2)))
                        else:
                            vals.append(int(v2))
                sample_rows.append((si, vals[0] if vals else 0))

    for f, w, v in _iter_fields(buf):
        if f == 2:
            walk_dictionary(bytes(v))
        elif f == 1:        # ResourceProfiles
            for f2, w2, v2 in _iter_fields(bytes(v)):
                if f2 == 2:  # ScopeProfiles
                    for f3, w3, v3 in _iter_fields(bytes(v2)):
                        if f3 == 2:  # Profile
                            walk_profile(bytes(v3))

    # resolve stacks: location idx → function idx
    func_names = [strings[n] if n < len(strings) else "" for n in functions]
    stack_funcs = [[locations[li] for li in s] for s in stacks]
    return {
        "strings": strings,
        "functions": pa.table({
            "func_idx": pa.array(range(len(functions)), pa.int64()),
            "name": pa.array(func_names, pa.string())}),
        "stacks": pa.table({
            "stack_idx": pa.array(range(len(stacks)), pa.int64()),
            "func_idxs": pa.array(stack_funcs, pa.list_(pa.int64()))}),
        "samples": pa.table({
            "stack_idx": pa.array([r[0] for r in sample_rows], pa.int64()),
            "value": pa.array([r[1] for r in sample_rows], pa.int64())}),
    }


def encode_profiles_json(function_table: pa.Table, samples: pa.Table,
                         sample_type: str = "samples",
                         sample_unit: str = "us") -> str:
    """Same inputs as ``encode_profiles_request`` → one OTLP/JSON line
    (ExportProfilesServiceRequest, camelCase field names per the OTLP JSON
    mapping — ``pdata/pprofile/json.go`` analog). Index conventions are
    identical to the proto marshaler (zero-sentinel row 0 per table), so
    the two wire forms are cross-marshaler comparable."""
    import json

    names = function_table.column("name").to_pylist()
    fids = function_table.column("func_id").to_pylist()
    dense = {int(f): i for i, f in enumerate(fids)}
    strings = ["", sample_type, sample_unit] + list(names)

    f0 = samples.column("f0_id").to_numpy(zero_copy_only=False)
    f1 = samples.column("f1_id").to_numpy(zero_copy_only=False)
    f2 = samples.column("f2_id").to_numpy(zero_copy_only=False)
    vals = samples.column("value_us").to_numpy(zero_copy_only=False)
    stacks = np.stack([f0, f1, f2], axis=1)
    uniq, stack_of_sample = np.unique(stacks, axis=0, return_inverse=True) \
        if len(stacks) else (np.empty((0, 3), np.int64),
                             np.empty(0, np.int64))

    dictionary = {
        "mappingTable": [{}],
        "locationTable": [{}] + [
            {"line": [{"functionIndex": i + 1}]}
            for i in range(len(names))],
        "functionTable": [{}] + [
            {"nameStrindex": 3 + i} for i in range(len(names))],
        "stringTable": strings,
        "stackTable": [{}] + [
            {"locationIndices": [dense[int(a)] + 1, dense[int(b)] + 1,
                                 dense[int(c)] + 1]}
            for a, b, c in uniq],
    }
    profile = {
        "sampleType": {"typeStrindex": 1, "unitStrindex": 2},
        "samples": [{"stackIndex": int(si) + 1, "values": [str(int(v))]}
                    for si, v in zip(stack_of_sample, vals)],
    }
    req = {
        "resourceProfiles": [{
            "resource": {},
            "scopeProfiles": [{
                "scope": {"name": "otelcol_ray"},
                "profiles": [profile],
            }],
        }],
        "dictionary": dictionary,
    }
    return json.dumps(req, separators=(",", ":"))


def decode_profiles_json(line: str) -> dict:
    """OTLP/JSON profiles line → the SAME dict shape as
    ``decode_profiles_request`` (strings / functions / stacks / samples),
    so the two unmarshalers are drop-in interchangeable."""
    import json

    req = json.loads(line)
    d = req.get("dictionary", {})
    strings = list(d.get("stringTable", []))
    functions = [int(f.get("nameStrindex", 0))
                 for f in d.get("functionTable", [])]
    locations = []
    for loc in d.get("locationTable", []):
        lines = loc.get("line", [])
        locations.append(int(lines[0].get("functionIndex", 0))
                         if lines else 0)
    stacks = [[int(i) for i in s.get("locationIndices", [])]
              for s in d.get("stackTable", [])]
    sample_rows: list[tuple[int, int]] = []
    for rp in req.get("resourceProfiles", []):
        for sp in rp.get("scopeProfiles", []):
            for prof in sp.get("profiles", []):
                for s in prof.get("samples", []):
                    vals = [int(v) for v in s.get("values", [])]
                    sample_rows.append((int(s.get("stackIndex", 0)),
                                        vals[0] if vals else 0))

    func_names = [strings[n] if n < len(strings) else "" for n in functions]
    stack_funcs = [[locations[li] for li in s] for s in stacks]
    return {
        "strings": strings,
        "functions": pa.table({
            "func_idx": pa.array(range(len(functions)), pa.int64()),
            "name": pa.array(func_names, pa.string())}),
        "stacks": pa.table({
            "stack_idx": pa.array(range(len(stacks)), pa.int64()),
            "func_idxs": pa.array(stack_funcs, pa.list_(pa.int64()))}),
        "samples": pa.table({
            "stack_idx": pa.array([r[0] for r in sample_rows], pa.int64()),
            "value": pa.array([r[1] for r in sample_rows], pa.int64())}),
    }


def decoded_top_functions(decoded: dict) -> pa.Table:
    """Per-function rollup straight from the DECODED wire form (name,
    n_samples, total, self) — the parity bridge to the analytic
    ``profiles.top_functions`` (self = leaf = LAST location of the
    stack)."""
    funcs = decoded["functions"]
    names = funcs.column("name").to_pylist()
    stacks = decoded["stacks"].column("func_idxs").to_pylist()
    samples = decoded["samples"]
    agg: dict[str, list[int]] = {}
    for si, val in zip(samples.column("stack_idx").to_pylist(),
                       samples.column("value").to_pylist()):
        fidxs = stacks[si]
        for depth, fi in enumerate(fidxs):
            nm = names[fi]
            row = agg.setdefault(nm, [0, 0, 0])
            row[0] += 1
            row[1] += val
            if depth == len(fidxs) - 1:
                row[2] += val
    items = sorted(agg.items())
    return pa.table({
        "name": pa.array([k for k, _ in items], pa.string()),
        "n_samples": pa.array([v[0] for _, v in items], pa.int64()),
        "total_us": pa.array([v[1] for _, v in items], pa.int64()),
        "self_us": pa.array([v[2] for _, v in items], pa.int64()),
    })
