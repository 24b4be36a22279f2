"""External-program transformer: token replacement, stdin/stdout vs
temp-file channels, metadata file formats (JSON/XML/properties with
the U+241E multi-value join), STDOUT/STDERR extraction patterns, and
the PropertySetter merge modes. Reference contract:
ExternalTransformer.java:40-209 + ExternalTransformerConfig.java."""

import sys

import pytest

from crawlspark.functions.external import (
    ExternalConfig,
    ExtractionPattern,
    apply_on_set,
    dump_meta,
    extract_patterns,
    external_transform,
    load_meta,
    run_external,
)

PY = sys.executable


def test_stdin_stdout_channel():
    cfg = ExternalConfig(command="tr a-z A-Z")
    content, meta = run_external(cfg, "doc:1", "hello world", {})
    assert content == "HELLO WORLD"
    assert meta == {}


def test_input_output_file_tokens(tmp_path):
    cfg = ExternalConfig(
        command=(
            f'{PY} -c "import sys; '
            "i, o = sys.argv[1], sys.argv[2]; "
            "open(o, 'w').write(open(i).read()[::-1])\" "
            "${INPUT} ${OUTPUT}"
        ),
        temp_dir=str(tmp_path),
    )
    content, _ = run_external(cfg, "doc:2", "abcdef", {})
    assert content == "fedcba"
    # temp files were deleted
    assert list(tmp_path.iterdir()) == []


def test_reference_token_and_env():
    cfg = ExternalConfig(
        command=f'{PY} -c "import os,sys; '
        "print(sys.argv[1] + '|' + os.environ['XV'])\" ${REFERENCE}",
        env=(("XV", "42"),),
    )
    content, _ = run_external(cfg, "http://h/p", "ignored", {})
    assert content.strip() == "http://h/p|42"


def test_output_meta_json_and_input_meta_roundtrip():
    # the app reads INPUT_META (json), writes OUTPUT_META adding a field
    # new metadata only — echoing input fields back would append
    # them onto themselves (PropertySetter.orAppend semantics)
    script = (
        "import json, sys; "
        "m = json.load(open(sys.argv[1])); "
        "json.dump({'lang': ['en'], "
        "'n_in': [str(len(m))]}, open(sys.argv[2], 'w')); "
        "sys.stdout.write('body')"
    )
    cfg = ExternalConfig(
        command=f'{PY} -c "{script}" ${{INPUT_META}} ${{OUTPUT_META}}',
    )
    content, meta = run_external(
        cfg, "r", "x", {"title": ["T1", "T2"]}
    )
    assert content == "body"
    assert meta == {
        "title": ["T1", "T2"], "lang": ["en"], "n_in": ["1"],
    }


@pytest.mark.parametrize("fmt", ["json", "xml", "properties"])
def test_meta_format_roundtrip(fmt):
    meta = {"a": ["1", "2"], "b": ["only"], "weird key": ["v"]}
    if fmt == "properties":
        meta.pop("weird key")  # '=' framing: keys without separators
    assert load_meta(dump_meta(meta, fmt), fmt) == meta


def test_extraction_patterns_stdout():
    cfg = ExternalConfig(
        command=f'{PY} -c "print(\'DocNo:1234\'); print(\'DocNo:99\')"',
        patterns=(
            ExtractionPattern(r"DocNo:(\d+)", field="docnumber",
                              value_group=1),
        ),
    )
    content, meta = run_external(cfg, "r", "", {})
    assert meta["docnumber"] == ["1234", "99"]


def test_extraction_field_and_value_groups():
    got = extract_patterns(
        ["score=0.9", "grade=A"],
        (ExtractionPattern(r"(\w+)=(\S+)", field_group=1,
                           value_group=2),),
    )
    assert got == {"score": ["0.9"], "grade": ["A"]}


def test_on_set_modes():
    base = {"k": ["old"]}
    new = {"k": ["new"], "j": ["x"]}
    assert apply_on_set(base, new, "append") == {
        "k": ["old", "new"], "j": ["x"],
    }
    assert apply_on_set(base, new, "replace") == {
        "k": ["new"], "j": ["x"],
    }
    assert apply_on_set(base, new, "set-if-empty") == {
        "k": ["old"], "j": ["x"],
    }


def test_nonzero_exit_raises():
    cfg = ExternalConfig(command=f'{PY} -c "import sys; sys.exit(3)"')
    with pytest.raises(RuntimeError, match="rc=3"):
        run_external(cfg, "r", "", {})


def test_external_transform_dataframe(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "alpha beta", {"src": ["seed"]}),
            ("d2", "gamma", None),
        ],
        "reference string, content string, "
        "meta map<string, array<string>>",
    )
    cfg = ExternalConfig(
        command="tr a-z A-Z",
        patterns=(
            ExtractionPattern(r"^[A-Z]+", field="firstword"),
        ),
    )
    got = {
        r["reference"]: r
        for r in external_transform(docs, cfg).collect()
    }
    assert got["d1"]["content"] == "ALPHA BETA"
    assert got["d2"]["content"] == "GAMMA"
    assert dict(got["d1"]["meta"])["src"] == ["seed"]
    assert dict(got["d1"]["meta"])["firstword"] == ["ALPHA"]
    assert dict(got["d2"]["meta"])["firstword"] == ["GAMMA"]


def test_reference_shell_metacharacters_not_interpreted(tmp_path):
    """A crafted reference full of shell metacharacters is passed as a
    literal argv element, never through a shell (SystemCommand
    semantics: tokenized argv)."""
    marker = tmp_path / "pwned"
    evil = f"http://h/; touch {marker} #&$(id)'\""
    cfg = ExternalConfig(
        command=f'{PY} -c "import sys; print(sys.argv[1])" '
        "${REFERENCE}",
    )
    content, _ = run_external(cfg, evil, "ignored", {})
    assert content.strip() == evil
    assert not marker.exists()


def test_embedded_token_substitution(tmp_path):
    """${...} tokens embedded inside an argument (--out=${OUTPUT})
    substitute in place, preserving the surrounding text."""
    cfg = ExternalConfig(
        command=(
            f'{PY} -c "import sys; '
            "o = sys.argv[1].split('=', 1)[1]; "
            "open(o, 'w').write('ok')\" "
            "--out=${OUTPUT}"
        ),
        temp_dir=str(tmp_path),
    )
    content, _ = run_external(cfg, "doc:t", "x", {})
    assert content == "ok"


BATCH_TOOL = (
    "import sys, json, os\n"
    "marker = sys.argv[1]\n"
    "open(marker, 'a').write('run\\n')\n"
    "for ln in sys.stdin:\n"
    "    if not ln.strip():\n"
    "        continue\n"
    "    d = json.loads(ln)\n"
    "    print(json.dumps({'content': d['content'].upper(),\n"
    "                      'metadata': {'seen': [d['reference']]}}))\n"
)


def test_batch_mode_one_process_per_batch(spark, tmp_path):
    """batch_mode=True: N documents -> ONE subprocess per Arrow
    batch (counted via a marker file), identical outputs to the
    per-document contract (content transformed, metadata merged)."""
    marker = tmp_path / "runs"
    docs = spark.createDataFrame(
        [(f"d{i}", f"text {i}", {"src": ["seed"]}) for i in range(6)],
        "reference string, content string, "
        "meta map<string, array<string>>",
    ).coalesce(1)
    cfg = ExternalConfig(
        command=f'{PY} -c "{BATCH_TOOL}" {marker}',
        batch_mode=True,
    )
    got = {
        r["reference"]: r
        for r in external_transform(docs, cfg).collect()
    }
    assert len(got) == 6
    for i in range(6):
        row = got[f"d{i}"]
        assert row["content"] == f"TEXT {i}"
        m = dict(row["meta"])
        assert m["src"] == ["seed"]          # input meta kept
        assert m["seen"] == [f"d{i}"]        # per-doc merge applied
    # one partition, one Arrow batch -> exactly one subprocess
    assert marker.read_text().count("run") == 1


def test_batch_mode_equals_per_document(spark):
    """The same upper-casing tool run per-document and per-batch
    yields identical frames."""
    tool_doc = ExternalConfig(command="tr a-z A-Z")
    tool_batch = ExternalConfig(
        command=(
            f'{PY} -c "import sys, json\n'
            "for ln in sys.stdin:\n"
            "    if ln.strip():\n"
            "        d = json.loads(ln)\n"
            "        print(json.dumps("
            "{'content': d['content'].upper()}))\""
        ),
        batch_mode=True,
    )
    docs = spark.createDataFrame(
        [("a", "alpha", None), ("b", "beta", None)],
        "reference string, content string, "
        "meta map<string, array<string>>",
    )
    per_doc = {
        r["reference"]: r["content"]
        for r in external_transform(docs, tool_doc).collect()
    }
    per_batch = {
        r["reference"]: r["content"]
        for r in external_transform(docs, tool_batch).collect()
    }
    assert per_doc == per_batch == {"a": "ALPHA", "b": "BETA"}


def test_batch_mode_rejects_patterns_and_count_mismatch(tmp_path):
    from crawlspark.functions.external import run_external_batch

    with pytest.raises(ValueError, match="patterns"):
        run_external_batch(
            ExternalConfig(
                command="cat",
                batch_mode=True,
                patterns=(ExtractionPattern(r"x", field="f"),),
            ),
            [("r", "c", {})],
        )
    cfg = ExternalConfig(
        command=f'{PY} -c "print(\'{{}}\')"', batch_mode=True
    )
    with pytest.raises(RuntimeError, match="output lines"):
        run_external_batch(cfg, [("a", "1", {}), ("b", "2", {})])
