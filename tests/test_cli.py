"""Console entry point (cli.py) — flag/validation parity with the
reference CLI (kinesis2sse.go:60-108,160-174). Pure parsing tests; the
end-to-end serve path is test_app.py's territory."""

import pytest

from kinesis2sse_spark.cli import build_parser, parse_routes


def test_routes_json_maps_to_route_configs():
    routes = parse_routes(
        '[{"path":"demo","stream":"/tmp/demo_src","start":"TRIM_HORIZON",'
        '"capacity":123}]',
        region="",
    )
    assert len(routes) == 1
    r = routes[0]
    assert r.pattern == "/demo"
    assert r.source_dir == "/tmp/demo_src"
    assert r.start == "TRIM_HORIZON"
    assert r.capacity == 123


def test_bare_stream_name_needs_region_and_builds_kinesis_uri():
    with pytest.raises(SystemExit, match="region must be specified"):
        parse_routes('[{"path":"p","stream":"my-stream"}]', region="")
    routes = parse_routes('[{"path":"p","stream":"my-stream"}]', region="eu-west-1")
    assert routes[0].source_dir == "kinesis://eu-west-1/my-stream"


def test_route_validation_matches_reference_errors():
    # kinesis2sse.go:100-108: empty path / empty stream name the index
    with pytest.raises(SystemExit, match='route at index 0 has an empty "path"'):
        parse_routes('[{"stream":"s"}]', region="r")
    with pytest.raises(SystemExit, match='route at index 1 has an empty "stream"'):
        parse_routes(
            '[{"path":"a","stream":"kafka://h:1/t"},{"path":"b"}]', region="r"
        )
    with pytest.raises(SystemExit, match="at least one route"):
        parse_routes("[]", region="r")
    with pytest.raises(SystemExit, match="unable to parse routes"):
        parse_routes("{not json", region="r")


def test_parser_defaults_match_reference():
    # kinesis2sse.go:20-25,168-174
    args = build_parser().parse_args([])
    assert args.port == 4444
    assert args.app_name_prefix == "kinesis2sse"
    assert args.shard_sync_interval_millis == 1_000
    assert args.failover_time_millis == 300_000
    assert args.debug is False
