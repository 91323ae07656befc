"""Pipeline with the edit-distance verification channel enabled."""

from wdedup_spark.plans.pipeline import PipelineConfig, run_pipeline


def test_pipeline_with_edit_channel(spark, tiny, tiny_turns, tmp_path):
    cfg = PipelineConfig(verify_edit=True, edit_threshold=0.9)
    out = run_pipeline(spark, tiny_turns, str(tmp_path / "edit"), cfg)
    cmap = {r["conv_id"]: r["cluster_id"] for r in out["clusters"].collect()}
    # recall still 1.0 on planted classes; edit channel adds no false merges
    missed = [
        (a, b, c)
        for a, b, c in tiny.oracle_pairs.itertuples(index=False)
        if cmap[a] != cmap[b]
    ]
    assert not missed
    # the edit channel only ever ADDS pairs relative to jaccard-only
    base = run_pipeline(spark, tiny_turns, str(tmp_path / "base"), PipelineConfig())
    n_edit = out["verified"].count()
    n_base = base["verified"].count()
    assert n_edit >= n_base
    vias = {r["via"][0] for r in out["verified"].select("via").distinct().collect()}
    assert vias <= {"jaccard", "substring", "edit"}
