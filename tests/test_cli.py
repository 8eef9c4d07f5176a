"""CLI entry point (python -m kaylee_spark job.py) — completes the
reference's unfinished server CLI contract (SURVEY.md §3.3)."""

from __future__ import annotations

import json


JOB = '''
def datafn():
    lines = ["a b a", "b a", "c"]
    return enumerate(lines)

def mapfn(k, line):
    return [(w, 1) for w in line.split()]

def reducefn(key, values):
    return sum(values)

def combiner(a, b):
    return a + b
'''


def test_cli_runs_job_module(spark, tmp_path):
    from kaylee_spark.__main__ import load_job_module, run_job

    job_file = tmp_path / "wordcount_job.py"
    job_file.write_text(JOB)
    results = run_job(load_job_module(str(job_file)), spark=spark)
    assert results == {"a": 3, "b": 2, "c": 1}


def test_cli_rejects_incomplete_module(tmp_path):
    import pytest

    from kaylee_spark.__main__ import load_job_module

    bad = tmp_path / "bad_job.py"
    bad.write_text("def datafn():\n    return []\n")  # mapfn/reducefn missing
    with pytest.raises(SystemExit):
        load_job_module(str(bad))


def test_cli_main_prints_sorted_json(spark, tmp_path, capsys):
    from kaylee_spark import __main__ as cli

    job_file = tmp_path / "wc.py"
    job_file.write_text(JOB)
    rc = cli.main([str(job_file)])
    out = capsys.readouterr().out.strip()
    assert rc == 0
    assert json.loads(out) == {"a": 3, "b": 2, "c": 1}
    assert out.index('"a"') < out.index('"b"') < out.index('"c"')


def test_cli_list_covers_whole_registry(capsys):
    from kaylee_spark.__main__ import cmd_list
    from kaylee_spark.queries import load_everything

    assert cmd_list() == 0
    out = capsys.readouterr().out
    names = {line.split()[0] for line in out.strip().splitlines()}
    assert names == set(load_everything())


def test_cli_query_runs_and_rejects_unknown(spark, capsys, monkeypatch):
    import json as _json

    import kaylee_spark.session as sess
    from kaylee_spark.__main__ import main

    monkeypatch.setattr(sess, "get_spark", lambda *a, **k: spark)
    rc = main(["query", "q07_distinct", "--sf-dir", "/root/testdata/sf0.001", "--limit", "2"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(lines) == 2
    assert set(_json.loads(lines[0])) == {"c_mktsegment", "c_nationkey"}

    import pytest

    with pytest.raises(SystemExit, match="unknown query"):
        main(["query", "q99_nonexistent"])
