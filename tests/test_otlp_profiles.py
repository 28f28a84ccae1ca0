"""pprofile wire codec: dictionary-encoded ProfilesData round trip and
parity between the decoded wire form and the analytic per-function
rollup (sources/otlp_profiles.py; reference pdata/pprofile +
generated_proto_profile*.go)."""

import pyarrow as pa

from opentelemetry_collector_ray.sources.otlp_profiles import (
    decode_profiles_request, decoded_top_functions, encode_profiles_request)


def _fixture():
    ftab = pa.table({
        "func_id": pa.array([0, 1, 2, 3], pa.int64()),
        "name": pa.array(["op::click", "proc::frontend", "status::err",
                          "status::ok"]),
    })
    samples = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "f0_id": pa.array([1, 1, 1], pa.int64()),   # proc::frontend root
        "f1_id": pa.array([0, 0, 0], pa.int64()),   # op::click
        "f2_id": pa.array([3, 3, 2], pa.int64()),   # ok, ok, err leaves
        "value_us": pa.array([100, 250, 40], pa.int64()),
    })
    return ftab, samples


def test_profiles_round_trip_dictionary():
    ftab, samples = _fixture()
    blob = encode_profiles_request(ftab, samples)
    dec = decode_profiles_request(blob)
    # string table: sentinel + type + unit + names
    assert dec["strings"][:3] == ["", "samples", "us"]
    assert set(dec["strings"][3:]) == set(ftab.column("name").to_pylist())
    # function table: sentinel + one per name, resolving to real names
    fn = dec["functions"].to_pylist()
    assert fn[0]["name"] == ""  # zero sentinel
    assert {r["name"] for r in fn[1:]} == set(ftab.column("name").to_pylist())
    # stacks: sentinel + 2 distinct (f0,f1,f2) stacks of depth 3
    st = dec["stacks"].to_pylist()
    assert st[0]["func_idxs"] == []
    assert all(len(r["func_idxs"]) == 3 for r in st[1:])
    assert len(st) == 1 + 2
    # samples: one per input row, values preserved
    sm = dec["samples"].to_pandas()
    assert sorted(sm["value"]) == [40, 100, 250]
    assert (sm["stack_idx"] > 0).all()  # sentinel never referenced


def test_decoded_rollup_matches_analytic(ray_session):
    """Wire parity: per-function totals computed from the DECODED blob
    equal the analytic top_functions over the same frames."""
    import ray.data

    from opentelemetry_collector_ray.sources.profiles import (
        build_function_table, derive_profile_frames, encode_samples,
        top_functions)

    events = ray.data.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "event_type", "value"])
    frames = derive_profile_frames(events)
    ftab = build_function_table(frames)
    samples = pa.concat_tables(
        [t for t in
         (__import__("ray").get(encode_samples(frames, ftab)
                                .to_arrow_refs())) if t.num_rows])
    blob = encode_profiles_request(ftab, samples)
    wire_rollup = decoded_top_functions(
        decode_profiles_request(blob)).to_pandas().set_index("name")
    analytic = top_functions(frames).to_pandas().set_index("name")
    assert sorted(wire_rollup.index) == sorted(analytic.index)
    for name in analytic.index:
        for col in ("n_samples", "total_us", "self_us"):
            assert wire_rollup.loc[name, col] == analytic.loc[name, col], \
                (name, col)


def test_profiles_json_round_trip_and_cross_marshaler_parity():
    """JSON wire form round-trips, and its decoded tables are IDENTICAL
    to the protobuf path's (same zero-sentinel index conventions)."""
    from opentelemetry_collector_ray.sources.otlp_profiles import (
        decode_profiles_json, encode_profiles_json)

    ftab, samples = _fixture()
    line = encode_profiles_json(ftab, samples)
    dec_j = decode_profiles_json(line)
    dec_p = decode_profiles_request(encode_profiles_request(ftab, samples))
    assert dec_j["strings"] == dec_p["strings"]
    assert dec_j["functions"].equals(dec_p["functions"])
    assert dec_j["stacks"].equals(dec_p["stacks"])
    assert dec_j["samples"].equals(dec_p["samples"])
    assert decoded_top_functions(dec_j).equals(decoded_top_functions(dec_p))


def test_profiles_json_empty():
    from opentelemetry_collector_ray.sources.otlp_profiles import (
        decode_profiles_json, encode_profiles_json)

    ftab = pa.table({"func_id": pa.array([], pa.int64()),
                     "name": pa.array([], pa.string())})
    samples = pa.table({"f0_id": pa.array([], pa.int64()),
                        "f1_id": pa.array([], pa.int64()),
                        "f2_id": pa.array([], pa.int64()),
                        "value_us": pa.array([], pa.int64())})
    dec = decode_profiles_json(encode_profiles_json(ftab, samples))
    assert len(dec["samples"]) == 0
    assert dec["strings"] == ["", "samples", "us"]


def _full_dictionary() -> dict:
    """A dictionary exercising every table and field the reference model
    carries: a mapping with memory/file fields, a MULTI-LINE location
    (inlined frames) with address + mapping + attributes, functions with
    system-name/filename/start-line, and typed attribute-table entries."""
    from opentelemetry_collector_ray.functions import typedattrs as tav

    m0 = {"memory_start": 0, "memory_limit": 0, "file_offset": 0,
          "filename_strindex": 0, "attribute_indices": []}
    l0 = {"mapping_index": 0, "address": 0, "lines": [],
          "attribute_indices": []}
    f0 = {"name_strindex": 0, "system_name_strindex": 0,
          "filename_strindex": 0, "start_line": 0}
    return {
        "strings": ["", "main", "inlined_helper", "libfoo.so",
                    "foo.c", "cpu", "ms"],
        "mappings": [m0, {"memory_start": 0x1000, "memory_limit": 0x9000,
                          "file_offset": 64, "filename_strindex": 3,
                          "attribute_indices": [1]}],
        "locations": [
            l0,
            {"mapping_index": 1, "address": 0x1a2b,
             "lines": [{"function_index": 2, "line": 12, "column": 7},
                       {"function_index": 1, "line": 88, "column": 0}],
             "attribute_indices": [1, 2]},
            {"mapping_index": 1, "address": 0x2000,
             "lines": [{"function_index": 1, "line": 40, "column": 2}],
             "attribute_indices": []},
        ],
        "functions": [
            f0,
            {"name_strindex": 1, "system_name_strindex": 1,
             "filename_strindex": 4, "start_line": 30},
            {"name_strindex": 2, "system_name_strindex": 2,
             "filename_strindex": 4, "start_line": 10},
        ],
        "attributes": [
            {"key_strindex": 5, "vtype": tav.VTYPE_STR, "value": "fast",
             "unit_strindex": 0},
            {"key_strindex": 5, "vtype": tav.VTYPE_INT, "value": -3,
             "unit_strindex": 6},
            {"key_strindex": 5, "vtype": tav.VTYPE_DOUBLE, "value": 2.5,
             "unit_strindex": 6},
        ],
        "stacks": [[], [1, 2], [2]],
    }


def test_dictionary_full_fidelity_proto_round_trip():
    """Every mapping/location(multi-line)/function/attribute field
    survives the proto dictionary codec (reference
    pdata/pprofile/dictionary_helpers.go tables)."""
    from opentelemetry_collector_ray.sources.otlp_profiles import (
        decode_dictionary, encode_dictionary)

    dic = _full_dictionary()
    back = decode_dictionary(encode_dictionary(dic))
    assert back == dic


def test_dictionary_full_fidelity_json_round_trip():
    """Same payload through the JSON marshaler pair."""
    import json

    from opentelemetry_collector_ray.sources.otlp_profiles import (
        dictionary_from_json, dictionary_to_json)

    dic = _full_dictionary()
    j = json.loads(json.dumps(dictionary_to_json(dic)))
    assert dictionary_from_json(j) == dic


def test_multiline_location_flat_lens_uses_innermost_frame():
    """decode_profiles_request keeps the full multi-line structure under
    'dictionary' and maps each location to Line[0]'s function (pprof:
    Line[0] is the innermost inlined frame) for the flat lens."""
    from opentelemetry_collector_ray.sources.otlp_profiles import (
        _len_field, _sample, _valuetype, _str_field,
        decode_profiles_request, encode_dictionary)

    dic = _full_dictionary()
    dictionary = encode_dictionary(dic)
    sample_msgs = _len_field(2, _sample(1, [250]))
    profile = _len_field(1, _valuetype(5, 6)) + sample_msgs
    scope = (_len_field(1, _str_field(1, "x")) + _len_field(2, profile))
    blob = (_len_field(1, _len_field(1, b"") + _len_field(2, scope))
            + _len_field(2, dictionary))
    out = decode_profiles_request(blob)
    assert out["dictionary"] == dic
    # location 1 has lines [fn2 (innermost), fn1]; the flat lens picks fn2
    stack_funcs = out["stacks"].column("func_idxs").to_pylist()
    assert stack_funcs[1] == [2, 1]  # stack [loc1, loc2] -> [fn2, fn1]
    names = out["functions"].column("name").to_pylist()
    assert names == ["", "main", "inlined_helper"]
