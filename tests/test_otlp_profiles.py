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
