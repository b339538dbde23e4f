"""FTP connector: ftplib client against the in-repo RFC 959 server."""
import json


def test_ftp_roundtrip(ray_session):
    import ray.data as rd

    from tenzir_ray.sources.ftp import load_ftp, mini_ftp_server, save_ftp

    srv, port, files = mini_ftp_server()
    try:
        rows = [{"id": i, "v": f"x{i}"} for i in range(12)]
        n = save_ftp(rd.from_items(rows), "out.ndjson", port=port)
        assert n == 12 and "out.ndjson" in files
        got = load_ftp("out.ndjson", port=port)().take_all()
        parsed = sorted(json.loads(r["line"])["id"] for r in got)
        assert parsed == list(range(12))
    finally:
        srv.close()


def test_ftp_nlst_and_missing_file(ray_session):
    import ftplib

    import pytest
    import ray.data as rd

    from tenzir_ray.sources.ftp import load_ftp, mini_ftp_server, save_ftp

    srv, port, files = mini_ftp_server()
    try:
        save_ftp(rd.from_items([{"a": 1}]), "a.ndjson", port=port)
        save_ftp(rd.from_items([{"b": 2}]), "b.ndjson", port=port)
        cli = ftplib.FTP()
        cli.connect("127.0.0.1", port, timeout=5)
        cli.login("anonymous", "")
        assert cli.nlst() == ["a.ndjson", "b.ndjson"]
        cli.quit()
        with pytest.raises(ftplib.error_perm):
            load_ftp("nope.ndjson", port=port)()
    finally:
        srv.close()
