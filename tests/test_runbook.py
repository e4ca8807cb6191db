"""RUNBOOK.md's smoke-test contract (r11 verdict ask #4): every
``python -m tools.fsck_index …`` line inside the runbook's fenced
``console`` blocks is extracted VERBATIM and executed against fixture
structures built on a temp root — the operator doc cannot drift from
the CLI. A command added to the runbook without a matching fixture
variable fails here with the unknown ``$VAR``; a CLI flag renamed
without updating the doc fails with argparse's error."""

from __future__ import annotations

import json
import os
import re
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNBOOK = os.path.join(REPO_ROOT, "RUNBOOK.md")


def _runbook_cli_lines() -> list[str]:
    text = open(RUNBOOK).read()
    lines: list[str] = []
    for block in re.findall(r"```console\n(.*?)```", text, flags=re.S):
        for line in block.strip().splitlines():
            line = line.strip()
            if line.startswith("python -m tools.fsck_index"):
                lines.append(line)
    return lines


def test_runbook_names_real_contracts():
    """Every `tests/…py[::test_fn]` citation the runbook makes as a
    contract resolves: the file exists, and a ::-qualified function
    name appears in it — renaming a pinned test without updating the
    runbook fails here, which is the doc-drift this test exists to
    catch."""
    text = open(RUNBOOK).read()
    cites = re.findall(r"`tests/([A-Za-z0-9_*]+\.py)(?:::(\w+))?`", text)
    assert cites, "runbook lost its contract citations"
    for name, func in cites:
        if "*" in name:
            continue
        path = os.path.join(REPO_ROOT, "tests", name)
        assert os.path.exists(path), f"RUNBOOK.md cites missing tests/{name}"
        if func:
            assert f"def {func}(" in open(path).read(), (
                f"RUNBOOK.md cites tests/{name}::{func} but no such "
                "function exists"
            )


def test_runbook_cli_lines_execute_clean(
    spark, sf_small, tmp_path, monkeypatch, capsys
):
    """Build one healthy fixture per runbook variable, then run every
    documented fsck_index invocation in order — each must exit 0 and
    print a JSON report."""
    from pyspark.sql import functions as F

    from etl_pricenow_to_leukerbadb_spark import session as sess
    from etl_pricenow_to_leukerbadb_spark.operators.ann_index import (
        build_pq_index,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.cluster_index import (
        build_cluster_assignments,
        ingest_and_update_clusters_vec,
        snapshot_cluster_assignments,
    )
    from etl_pricenow_to_leukerbadb_spark.operators.dedup_index import (
        build_dedup_index,
        build_vec_dedup_index,
        migrate_dedup_index_to_serving,
    )
    from etl_pricenow_to_leukerbadb_spark.orchestrate import curate_corpus_daily
    from etl_pricenow_to_leukerbadb_spark.sources.tables import load_table
    from tools.fsck_index import main as fsck_main

    class _NoStop:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

        def stop(self):  # the CLI stops its session; ours is shared
            pass

    monkeypatch.setattr(sess, "get_spark", lambda **kw: _NoStop(spark))

    docs = load_table(spark, sf_small, "documents")
    vecs = load_table(spark, sf_small, "embeddings")

    # §1/§4/§5/§6 text triple — built by the composed job itself
    paths = {
        "$IDX": str(tmp_path / "idx"),
        "$CL": str(tmp_path / "cl"),
        "$SNAP": str(tmp_path / "snap"),
        "$IDXS": str(tmp_path / "idxs"),
        "$VIDX": str(tmp_path / "vidx"),
        "$ANN": str(tmp_path / "ann"),
        "$VIDX2": str(tmp_path / "vidx2"),
        "$VCL": str(tmp_path / "vcl"),
        "$VSNAP": str(tmp_path / "vsnap"),
    }
    curate_corpus_daily(
        docs.filter(F.col("doc_id") < 100),
        paths["$IDX"],
        paths["$CL"],
        paths["$SNAP"],
    )
    # §1 serving-migrated text index
    build_dedup_index(
        docs.filter(F.col("doc_id") < 60), paths["$IDXS"], allow_short=True
    )
    migrate_dedup_index_to_serving(spark, paths["$IDXS"])
    # §2 vector index
    build_vec_dedup_index(
        vecs.filter(F.col("vec_id") % 2 == 0),
        paths["$VIDX"],
        n_planes=4,
        n_tables=4,
        dim=64,
    )
    # §3 ANN (PQ) index
    build_pq_index(
        vecs.filter(F.col("vec_id") < 2000),
        paths["$ANN"],
        n_subspaces=4,
        sub_dim=16,
        n_codes=8,
    )
    # §6 embedding-side triple (the vec ingest loop)
    build_vec_dedup_index(
        vecs.filter(F.col("vec_id") % 2 == 0),
        paths["$VIDX2"],
        n_planes=4,
        n_tables=4,
        dim=64,
    )
    build_cluster_assignments(
        spark.createDataFrame([], "node bigint, component bigint"),
        paths["$VCL"],
    )
    ingest_and_update_clusters_vec(
        vecs.filter(F.col("vec_id") % 2 == 1), paths["$VIDX2"], paths["$VCL"]
    )
    snapshot_cluster_assignments(spark, paths["$VCL"], paths["$VSNAP"])

    lines = _runbook_cli_lines()
    assert len(lines) >= 12, "runbook lost its documented invocations"
    for line in lines:
        argv = line.split()[2:]  # drop "python -m"; keep tool + args
        argv = [paths.get(a, a) for a in argv]
        unknown = [a for a in argv if a.startswith("$")]
        assert not unknown, f"runbook var with no fixture: {unknown} in {line!r}"
        monkeypatch.setattr(sys, "argv", ["fsck_index"] + argv[1:])
        rc = fsck_main()
        out = capsys.readouterr().out.strip().splitlines()[-1]
        report = json.loads(out)  # every mode prints a JSON envelope
        assert rc == 0, f"{line!r} exited {rc}: {report}"
