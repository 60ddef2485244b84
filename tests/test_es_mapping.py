"""Search-index mapping artifact (reference lib/aushape.mapping.json:1-92
analog) — structure derives from the collector registry."""

from __future__ import annotations

import json

from transcriptpipe import docschema, schemas


def test_es_mapping_covers_every_collector_role():
    m = docschema.es_mapping()
    props = m["properties"]
    data = props["data"]["properties"]
    for role, coll in schemas.COLLECTORS.items():
        if coll == schemas.COLL_DROP:
            assert role not in data  # EOE never reaches data{}
        else:
            assert role in data, role
            # repeated/slot roles are arrays of field objects -> nested
            want = "nested" if coll in (schemas.COLL_REP, schemas.COLL_SLOT) \
                else "object"
            assert data[role]["type"] == want, role
    # envelope fields typed like the reference's (serial long, time date)
    assert props["serial"]["type"] == "long"
    assert props["time"]["type"] == "date"
    assert props["trimmed"]["type"] == "boolean"
    assert "args" in data and "tools" in data
    # catch-all dynamic templates present (unknown record types)
    paths = [list(t.values())[0]["path_match"] for t in m["dynamic_templates"]]
    assert "data.*" in paths and "data.*.*" in paths


def test_registry_change_flows_into_mapping(monkeypatch):
    monkeypatch.setitem(schemas.COLLECTORS, "critique", schemas.COLL_REP)
    try:
        m = docschema.es_mapping()
        assert m["properties"]["data"]["properties"]["critique"]["type"] == "nested"
    finally:
        pass  # monkeypatch restores


def test_write_es_mapping_roundtrip(tmp_path):
    p = str(tmp_path / "_es_mapping.json")
    m = docschema.write_es_mapping(p)
    with open(p) as f:
        assert json.load(f) == m
