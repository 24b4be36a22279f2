"""Script transformer/condition ext point: expression and
function-body scripts, metadata mutation retention, config-time
syntax failure, condition keep/drop. Reference contract:
ScriptTransformer.java:34-146 (reference/content/metadata variables,
return = modified content), ScriptCondition (return = verdict)."""

import pytest

from crawlspark.functions.scripting import (
    compile_script,
    script_condition,
    script_transform,
)


def test_compile_expression_and_body():
    expr = compile_script("content.upper()")
    assert expr("r", "abc", {}) == "ABC"
    body = compile_script(
        """
        words = content.split()
        metadata["n_words"] = [str(len(words))]
        return " ".join(w for w in words if w != "Alice")
        """
    )
    meta = {}
    out = body("r", "Alice met Bob", meta)
    assert out == "met Bob"
    assert meta == {"n_words": ["3"]}


def test_compile_syntax_error_fails_at_config_time():
    with pytest.raises(SyntaxError):
        compile_script("def broken(:")


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d1", "Alice met Bob", {"src": ["a"]}),
            ("d2", "no names here", None),
        ],
        "reference string, content string, "
        "meta map<string, array<string>>",
    )


def test_script_transform_dataframe(spark):
    got = {
        r["reference"]: r
        for r in script_transform(
            _docs(spark),
            'content.replace("Alice", "Roger")',
        ).collect()
    }
    assert got["d1"]["content"] == "Roger met Bob"
    assert got["d2"]["content"] == "no names here"
    assert dict(got["d1"]["meta"]) == {"src": ["a"]}


def test_script_transform_metadata_mutation(spark):
    got = {
        r["reference"]: dict(r["meta"])
        for r in script_transform(
            _docs(spark),
            """
            metadata["len"] = [str(len(content))]
            return content
            """,
        ).collect()
    }
    assert got["d1"]["len"] == ["13"]
    assert got["d2"] == {"len": ["13"]}


def test_script_condition_keep_and_drop(spark):
    docs = _docs(spark)
    kept = script_condition(docs, '"Alice" in content').collect()
    assert [r["reference"] for r in kept] == ["d1"]
    dropped = script_condition(
        docs, '"Alice" in content', keep=False
    ).collect()
    assert [r["reference"] for r in dropped] == ["d2"]
