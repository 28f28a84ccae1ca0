"""Delta↔cumulative temporality conversion round trip."""

import numpy as np
import pandas as pd


def test_delta_cumulative_round_trip(ray_session):
    import ray.data

    from opentelemetry_collector_ray.stages.temporal import (
        cumulative_to_delta, delta_to_cumulative)

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "series": rng.choice(["a", "b", "c"], 300),
        "t": rng.permutation(300),
        "v": rng.integers(0, 100, 300),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    cum = delta_to_cumulative(ds, "series", "t", "v", out_col="cum")
    back = cumulative_to_delta(cum, "series", "t", "cum", out_col="v2")
    out = back.to_pandas().sort_values(["series", "t"]).reset_index(drop=True)
    exp = df.sort_values(["series", "t"]).reset_index(drop=True)
    assert (out["v2"].to_numpy() == exp["v"].to_numpy()).all()
    # cumulative is monotone per series
    assert (out.groupby("series")["cum"].diff().dropna() >= 0).all()
