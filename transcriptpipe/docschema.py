"""Declared JSON Schema for emitted event documents — the analog of the
reference's externally-declared output schema
(/root/reference/lib/aushape.schema.json; XSD lib/aushape.xsd), used by
tests to validate every emitted doc structurally (SURVEY.md §5.2)."""

from __future__ import annotations

FIELDS_SCHEMA = {
    "type": "object",
    # field name -> [interpreted, raw?] (ref lib/field.c:116-130)
    "additionalProperties": {
        "type": "array",
        "items": {"type": "string"},
        "minItems": 1,
        "maxItems": 2,
    },
}

NORM_SCHEMA = {
    "type": "object",
    "additionalProperties": False,
    "required": ["event_kind", "action", "result", "key"],
    "properties": {
        "event_kind": {"enum": ["tool_use", "dialogue"]},
        "session": {"type": ["integer", "null"]},
        "subject_kind": {"type": "string"},
        "subject_primary": {"type": "string"},
        "subject_secondary": {"type": "string"},
        "subject_attrs": {"type": "array", "items": {"type": "string"}},
        "action": {"enum": ["call", "converse"]},
        "object_kind": {"enum": ["tool_args"]},
        "object_primary": {"type": "string"},
        "object_secondary": {"type": "string"},
        "object_primary2": {"type": "string"},
        "object_attrs": {"type": "array", "items": {"type": "string"}},
        "result": {"type": "integer", "minimum": 0},
        "how": {"type": "string"},
        "key": {"type": "string"},
    },
}

# The event document (ref lib/aushape.schema.json:270-503:
# {serial, time, text[], data{}, norm{}, error?, trimmed?}).
EVENT_DOC_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "additionalProperties": False,
    "required": ["serial", "time"],
    "properties": {
        "serial": {"type": ["integer", "null"]},
        "time": {
            "type": "string",
            "pattern": r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z$",
        },
        "text": {"type": "array", "items": {"type": ["string", "null"]}},
        "data": {
            "type": "object",
            "properties": {
                "system": FIELDS_SCHEMA,
                "user": {"type": "array", "items": FIELDS_SCHEMA},
                "assistant": {"type": "array", "items": FIELDS_SCHEMA},
                "tool_call": {"type": "array", "items": FIELDS_SCHEMA},
                "tool_result": {"type": "array", "items": FIELDS_SCHEMA},
                "args": {"type": "array", "items": {"type": ["string", "null"]}},
                "tools": {"type": "array", "items": {"type": "string"}},
            },
            # catch-all roles (unknown record types) are uniq-collected
            # fields objects under their lowercased name
            "additionalProperties": FIELDS_SCHEMA,
        },
        "norm": NORM_SCHEMA,
        "error": {
            "enum": [
                "INVALID_EXECVE", "INVALID_PATH", "REPEATED_RECORD",
                "INVALID_HEX", "UNKNOWN_TOOL", "PARSE_FAIL",
            ]
        },
        "trimmed": {"const": True},
    },
}


def validate_doc(doc_json: str) -> None:
    """Raise jsonschema.ValidationError if the emitted doc is malformed."""
    import json

    import jsonschema

    jsonschema.validate(json.loads(doc_json), EVENT_DOC_SCHEMA)
