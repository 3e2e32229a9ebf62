import pytest

from spider_ray.corpus import write_corpus


@pytest.mark.usefixtures("ray_session")
def test_cli_crawl_catch_cobweb(tmp_path, capsys):
    from spider_ray.cli import main

    corpus = write_corpus(str(tmp_path / "c"), n_pages=60, n_hosts=4)
    out = str(tmp_path / "o")
    cfg = str(tmp_path)

    rc = main(
        ["crawl", "https://h0.example/p0", "--corpus", corpus, "--out", out, "--depth", "2"],
        config_dir=cfg,
    )
    assert rc == 0
    captured = capsys.readouterr().out
    assert "Done. (crawled:" in captured and "total calls:" in captured

    rc = main(["catch", "https://h0.example/p0", "--out", out, "-n", "3"], config_dir=cfg)
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("#")]
    assert len(lines) == 3 and lines[0].startswith("#1 https://h0.example/p0 | ")

    rc = main(["cobweb", "count", "--out", out], config_dir=cfg)
    assert rc == 0
    assert int(capsys.readouterr().out.strip()) > 0

    rc = main(["cobweb", "drop", "--out", out], config_dir=cfg)
    assert rc == 0
    capsys.readouterr()
    rc = main(["cobweb", "create", "--out", out], config_dir=cfg)
    assert rc == 0
    assert "Created." in capsys.readouterr().out


@pytest.mark.usefixtures("ray_session")
def test_cli_silent_and_config_update(tmp_path, capsys):
    from spider_ray.cli import main
    from spider_ray.config import ConfigController

    corpus = write_corpus(str(tmp_path / "c"), n_pages=30, n_hosts=2)
    rc = main(
        [
            "--db-type", "csv", "--db-update",
            "crawl", "h0.example/p0",
            "--corpus", corpus, "--out", str(tmp_path / "o"), "--silent",
        ],
        config_dir=str(tmp_path),
    )
    assert rc == 0
    assert capsys.readouterr().out == ""
    assert ConfigController(base_dir=str(tmp_path)).get_db_config("type") == "csv"


@pytest.mark.usefixtures("ray_session")
def test_cli_recrawl_overwrite_semantics(tmp_path, capsys):
    from spider_ray.cli import main
    from spider_ray.pipelines.crawl import read_store

    corpus = write_corpus(str(tmp_path / "c"), n_pages=60, n_hosts=4)
    out = str(tmp_path / "o")
    cfg = str(tmp_path)
    assert main(["crawl", "https://h0.example/p0", "--corpus", corpus, "--out", out,
                 "--depth", "1"], config_dir=cfg) == 0
    first = read_store(out).to_pandas()
    # re-crawl from a different seed with --no-overwrite: old rows kept,
    # new-only rows added
    assert main(["crawl", "https://h1.example/p0", "--corpus", corpus, "--out", out,
                 "--depth", "1", "--no-overwrite"], config_dir=cfg) == 0
    merged = read_store(out).to_pandas()
    assert set(first.url) <= set(merged.url)
    for u in set(first.url):
        assert (
            merged[merged.url == u].discovery_rank.iloc[0]
            == first[first.url == u].discovery_rank.iloc[0]
        )
    capsys.readouterr()


@pytest.mark.usefixtures("ray_session")
def test_cli_db_type_export(tmp_path, capsys):
    import os

    from spider_ray.cli import main

    corpus = write_corpus(str(tmp_path / "c"), n_pages=30, n_hosts=2)
    out = str(tmp_path / "o")
    assert main(["--db-type", "csv", "crawl", "https://h0.example/p0",
                 "--corpus", corpus, "--out", out], config_dir=str(tmp_path)) == 0
    assert "Exported store via csv sink" in capsys.readouterr().out
    assert os.path.isdir(os.path.join(out, "export-csv"))


@pytest.mark.usefixtures("ray_session")
def test_cli_cobweb_count_on_empty_store(tmp_path, capsys):
    from spider_ray.cli import main

    out = str(tmp_path / "o")
    assert main(["cobweb", "create", "--out", out], config_dir=str(tmp_path)) == 0
    capsys.readouterr()
    assert main(["cobweb", "count", "--out", out], config_dir=str(tmp_path)) == 0
    assert capsys.readouterr().out.strip() == "0"


def test_cli_no_command(tmp_path):
    from spider_ray.cli import main

    assert main([], config_dir=str(tmp_path)) == 2
