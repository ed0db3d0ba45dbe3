"""End-to-end CLI smoke: every tool binary equivalent runs in-process on
a tiny collection, mirroring the reference README walkthrough
(README.md:50-135) — gen -> create_freq_index --check -> wand ->
queries (cursor + resident engines) -> profile_queries ->
profile_decoding -> dec_time_regression -> optimal_hybrid_index."""

import json
import sys

import numpy as np
import pytest


def run_tool(monkeypatch, capsys, mod, argv):
    import importlib

    m = importlib.import_module(f"ds2i_tpu.tools.{mod}")
    monkeypatch.setattr(sys, "argv", [mod] + [str(a) for a in argv])
    m.main()
    out = capsys.readouterr().out
    return [json.loads(l) for l in out.splitlines() if l.startswith("{")]


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    from ds2i_tpu.io import generate_collection

    b = str(tmp_path_factory.mktemp("cli") / "coll")
    generate_collection(b, num_docs=400, num_terms=900, postings_target=15000,
                        num_queries=25, max_query_len=3)
    return b


def test_cli_walkthrough(base, tmp_path, monkeypatch, capsys):
    idx = str(tmp_path / "idx.bin")
    wand = str(tmp_path / "wand.bin")

    stats = run_tool(monkeypatch, capsys, "create_freq_index",
                     ["block_optpfor", base, idx, "--check"])
    assert any("bits_per_posting" in s for s in stats)

    run_tool(monkeypatch, capsys, "create_wand_data", [base, wand])

    stats = run_tool(monkeypatch, capsys, "queries",
                     ["block_optpfor", "and:ranked_and:wand:maxscore", idx, wand,
                      "--queries", base + ".queries"])
    assert {s["query"] for s in stats} == {"and", "ranked_and", "wand", "maxscore"}
    assert all(s["avg"] > 0 for s in stats)

    stats = run_tool(monkeypatch, capsys, "queries",
                     ["block_optpfor", "ranked_and", idx, wand,
                      "--queries", base + ".queries", "--engine", "resident"])
    assert stats and stats[0]["engine"] == "resident"

    bs = str(tmp_path / "blockstats.tsv")
    run_tool(monkeypatch, capsys, "profile_queries",
             ["block_optpfor", "ranked_and", idx, wand,
              "--queries", base + ".queries", "--out", bs])
    assert sum(1 for _ in open(bs)) > 0

    # the closed-form profile equals the serial cursor replay exactly
    bs_replay = str(tmp_path / "blockstats_replay.tsv")
    run_tool(monkeypatch, capsys, "profile_queries",
             ["block_optpfor", "ranked_and", idx, wand,
              "--queries", base + ".queries", "--out", bs_replay, "--replay"])
    assert open(bs).read() == open(bs_replay).read()

    prof = str(tmp_path / "prof.jsonl")
    run_tool(monkeypatch, capsys, "profile_decoding",
             ["block_optpfor", idx, "0.5", "--out", prof])
    assert sum(1 for _ in open(prof)) > 0

    # device-engine decode profiling: same record schema, times from the
    # resident kernels (profile_decoding.cpp:13-41 measures the serving
    # path; --engine resident is that measurement for the device engine)
    prof_dev = str(tmp_path / "prof_dev.jsonl")
    run_tool(monkeypatch, capsys, "profile_decoding",
             ["block_optpfor", idx, "0.08", "--out", prof_dev,
              "--engine", "resident", "--copies", "8", "--replays", "4"])
    dev_recs = [json.loads(l) for l in open(prof_dev)]
    assert dev_recs
    host_recs = [json.loads(l) for l in open(prof)]
    assert set(dev_recs[0]) == set(host_recs[0])
    assert sum(1 for r in dev_recs if r["time"] > 0) >= len(dev_recs) // 2

    weights = str(tmp_path / "weights.tsv")
    run_tool(monkeypatch, capsys, "dec_time_regression", [prof, "--out", weights])
    assert open(weights).read().startswith("type")

    lambdas = str(tmp_path / "lambdas.bin")
    mixed = str(tmp_path / "mixed.bin")
    stats = run_tool(monkeypatch, capsys, "optimal_hybrid_index",
                     ["block_optpfor", weights, bs, idx, lambdas, "60000", mixed,
                      "--check", base])
    assert any(s.get("type") == "block_mixed" for s in stats)

    # the rebuilt hybrid serves identical ranked results
    from ds2i_tpu.queries import QUERY_OPS, read_queries
    from ds2i_tpu.tools.common import load_index, load_wand_data

    i1 = load_index(idx, "block_optpfor")
    i2 = load_index(mixed, "block_mixed")
    w = load_wand_data(wand)
    for q in read_queries(base + ".queries")[:10]:
        a = QUERY_OPS["ranked_and"](i1, w, 10)(q)
        b = QUERY_OPS["ranked_and"](i2, w, 10)(q)
        np.testing.assert_allclose(a, b, rtol=1e-6)
