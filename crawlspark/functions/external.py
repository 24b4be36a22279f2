"""External-program document transformer (ExternalTransformer analog).

Re-expresses the reference's external-application handler from
scratch (importer/.../transformer/impl/ExternalTransformer.java:
40-551 + ExternalTransformerConfig.java):

* the command may name ``${INPUT}`` / ``${OUTPUT}`` /
  ``${INPUT_META}`` / ``${OUTPUT_META}`` / ``${REFERENCE}`` tokens,
  each replaced by a temp-file path (deleted afterwards); omitting
  ``${INPUT}``/``${OUTPUT}`` falls back to STDIN/STDOUT
  (ExternalTransformer.java:63-100);
* metadata files carry ``{field: [values]}`` JSON (default), Java
  properties-XML, or Java properties — multi-values joined by U+241E
  in the latter two (:116-158);
* when ``${OUTPUT_META}`` is omitted, metadata extraction patterns
  run over each STDOUT/STDERR line; a pattern without a match group
  stores the whole match under its field; field/value match groups
  may name both sides from one regex (:160-193);
* extracted values APPEND to existing fields by default
  (PropertySetter.orAppend, :195-202; "replace"/"set" also
  supported);
* per-execution environment variables override the worker's
  (:205-209).

Spark shape: ``mapInPandas`` over (reference, content, meta)
batches. One subprocess per document is inherent — the handler IS an
external program run per document, exactly as the reference forks
its SystemCommand per handle() call; Arrow batches amortize the
transfer, and executors fan the forks out across the cluster. The
hot path for bulk text work remains the Column-expression
transformers in functions/transformers.py — this is the escape
hatch for the tools a pipeline cannot re-express (OCR binaries,
in-house scorers, legacy filters).
"""

from __future__ import annotations

import json
import os
import re
import shlex
import subprocess
import tempfile
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# multi-value join symbol in xml/properties metadata files
# (ExternalTransformer.java:118: record separator U+241E)
MULTI_SEP = "␞"

META_JSON = "json"
META_XML = "xml"
META_PROPERTIES = "properties"

_TOKENS = ("${INPUT}", "${OUTPUT}", "${INPUT_META}", "${OUTPUT_META}",
           "${REFERENCE}")


@dataclass(frozen=True)
class ExtractionPattern:
    """RegexFieldValueExtractor analog: ``field`` names the target
    (optional when ``field_group`` captures it); ``value_group``/
    ``field_group`` are regex group numbers (0/None = whole match)."""

    pattern: str
    field: Optional[str] = None
    value_group: int = 0
    field_group: Optional[int] = None


@dataclass(frozen=True)
class ExternalConfig:
    command: str  # with optional ${...} tokens
    metadata_input_format: str = META_JSON
    metadata_output_format: Optional[str] = META_JSON
    patterns: tuple[ExtractionPattern, ...] = ()
    env: tuple[tuple[str, str], ...] = ()
    on_set: str = "append"  # append | replace | set-if-empty
    temp_dir: Optional[str] = None
    timeout_s: float = 60.0
    # batch_mode=True runs ONE subprocess per Arrow batch instead of
    # per document (our extension — the reference forks per handle()
    # call): the program reads NDJSON lines {"reference", "content",
    # "metadata"} on STDIN (or ${INPUT}), and writes one NDJSON line
    # per input line — {"content", "metadata"(optional)} — in the
    # SAME ORDER on STDOUT (or ${OUTPUT}). metadata merges via
    # on_set; extraction patterns are per-document constructs and
    # raise in batch mode. Use for tools with expensive startup
    # (model servers, JVM CLIs).
    batch_mode: bool = False


# ---------------------------------------------------------------------------
# metadata file formats (Properties.loadFrom{JSON,XML,Properties})
# ---------------------------------------------------------------------------


def dump_meta(meta: dict[str, list[str]], fmt: str) -> str:
    if fmt == META_JSON:
        return json.dumps(meta, sort_keys=True)
    if fmt == META_XML:
        root = ET.Element("properties")
        for k in sorted(meta):
            e = ET.SubElement(root, "entry", key=k)
            e.text = MULTI_SEP.join(meta[k])
        return ET.tostring(root, encoding="unicode")
    if fmt == META_PROPERTIES:
        lines = []
        for k in sorted(meta):
            lines.append(f"{k} = {MULTI_SEP.join(meta[k])}")
        return "\n".join(lines) + "\n"
    raise ValueError(f"unknown metadata format {fmt!r}")


def load_meta(text: str, fmt: str) -> dict[str, list[str]]:
    if fmt == META_JSON:
        raw = json.loads(text) if text.strip() else {}
        return {
            k: [str(x) for x in v] if isinstance(v, list) else [str(v)]
            for k, v in raw.items()
        }
    if fmt == META_XML:
        out: dict[str, list[str]] = {}
        root = ET.fromstring(text)
        for e in root.iter("entry"):
            k = e.get("key")
            if k is not None:
                out[k] = (e.text or "").split(MULTI_SEP)
        return out
    if fmt == META_PROPERTIES:
        out = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            k, _, v = line.partition("=")
            out[k.strip()] = v.strip().split(MULTI_SEP)
        return out
    raise ValueError(f"unknown metadata format {fmt!r}")


def extract_patterns(
    lines: list[str], patterns: tuple[ExtractionPattern, ...]
) -> dict[str, list[str]]:
    """Per-line STDOUT/STDERR extraction
    (ExternalTransformer.java:176-193)."""
    out: dict[str, list[str]] = {}
    for line in lines:
        for p in patterns:
            for m in re.finditer(p.pattern, line):
                field = p.field
                if p.field_group is not None:
                    field = m.group(p.field_group)
                if not field:
                    continue
                value = m.group(p.value_group)
                if value is not None:
                    out.setdefault(field, []).append(value)
    return out


def apply_on_set(
    meta: dict[str, list[str]],
    new: dict[str, list[str]],
    on_set: str,
) -> dict[str, list[str]]:
    out = {k: list(v) for k, v in meta.items()}
    for k, v in new.items():
        if on_set == "replace":
            out[k] = list(v)
        elif on_set == "set-if-empty":
            if not out.get(k):
                out[k] = list(v)
        else:  # append (PropertySetter.orAppend default)
            out[k] = out.get(k, []) + list(v)
    return out


# ---------------------------------------------------------------------------
# one document through the external program
# ---------------------------------------------------------------------------


def run_external(
    cfg: ExternalConfig,
    reference: str,
    content: str,
    meta: dict[str, list[str]],
) -> tuple[str, dict[str, list[str]]]:
    """-> (new content, merged metadata)."""
    # Tokenize the configured command ONCE, then substitute ${...}
    # tokens per-argument — matching the reference's SystemCommand
    # semantics (tokenized argv, never a shell). A crawled reference
    # is attacker-influenced text, so it must never reach a shell:
    # with shell=True a link like http://x/;rm would execute on every
    # executor. Values substituted after the split can contain any
    # byte without re-tokenizing or being interpreted.
    argv = shlex.split(cfg.command)
    cmd_has = cfg.command.__contains__
    tmp: list[str] = []

    def temp(suffix: str, body: str | None = None) -> str:
        fd, path = tempfile.mkstemp(
            suffix=suffix, dir=cfg.temp_dir
        )
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            if body is not None:
                f.write(body)
        tmp.append(path)
        return path

    def sub(token: str, value: str) -> None:
        nonlocal argv
        argv = [a.replace(token, value) for a in argv]

    try:
        use_stdin = not cmd_has("${INPUT}")
        if not use_stdin:
            sub("${INPUT}", temp(".in", content))
        if cmd_has("${INPUT_META}"):
            sub(
                "${INPUT_META}",
                temp(".inmeta",
                     dump_meta(meta, cfg.metadata_input_format)),
            )
        out_file = None
        if cmd_has("${OUTPUT}"):
            out_file = temp(".out")
            sub("${OUTPUT}", out_file)
        out_meta_file = None
        if cmd_has("${OUTPUT_META}"):
            out_meta_file = temp(".outmeta")
            sub("${OUTPUT_META}", out_meta_file)
        if cmd_has("${REFERENCE}"):
            sub("${REFERENCE}", reference)

        env = dict(os.environ)
        env.update(dict(cfg.env))
        proc = subprocess.run(
            argv,
            input=content if use_stdin else None,
            capture_output=True,
            text=True,
            env=env,
            timeout=cfg.timeout_s,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"external transformer: command failed "
                f"(rc={proc.returncode}) for {reference!r}: "
                f"{proc.stderr[-500:]}"
            )

        if out_file is not None:
            with open(out_file, encoding="utf-8") as f:
                new_content = f.read()
        else:
            new_content = proc.stdout

        new_meta: dict[str, list[str]] = {}
        if out_meta_file is not None:
            with open(out_meta_file, encoding="utf-8") as f:
                body = f.read()
            if cfg.metadata_output_format:
                new_meta = load_meta(body, cfg.metadata_output_format)
            else:
                new_meta = extract_patterns(
                    body.splitlines(), cfg.patterns
                )
        elif cfg.patterns:
            # patterns over STDOUT and STDERR lines; when STDOUT is
            # also the content channel the reference still scans it
            new_meta = extract_patterns(
                proc.stdout.splitlines() + proc.stderr.splitlines(),
                cfg.patterns,
            )
        return new_content, apply_on_set(meta, new_meta, cfg.on_set)
    finally:
        for path in tmp:
            try:
                os.unlink(path)
            except OSError:
                pass


# ---------------------------------------------------------------------------
# the Spark surface
# ---------------------------------------------------------------------------

EXTERNAL_SCHEMA = T.StructType(
    [
        T.StructField("reference", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField(
            "meta",
            T.MapType(T.StringType(), T.ArrayType(T.StringType())),
        ),
    ]
)


def run_external_batch(
    cfg: ExternalConfig,
    rows: list[tuple[str, str, dict[str, list[str]]]],
) -> list[tuple[str, dict[str, list[str]]]]:
    """One subprocess for a whole batch: NDJSON in, NDJSON out, order
    preserved. ``rows`` = [(reference, content, meta)]; returns
    [(new content, merged metadata)] — merge semantics identical to
    the per-document path's metadata files (apply_on_set)."""
    if cfg.patterns:
        raise ValueError(
            "extraction patterns are per-document (STDOUT-line "
            "scoped); use batch_mode=False with patterns"
        )
    ndjson_in = "\n".join(
        json.dumps(
            {"reference": r, "content": c, "metadata": m},
            sort_keys=True,
        )
        for r, c, m in rows
    ) + "\n"
    argv = shlex.split(cfg.command)
    tmp: list[str] = []

    def temp(suffix: str, body: str | None = None) -> str:
        fd, path = tempfile.mkstemp(suffix=suffix, dir=cfg.temp_dir)
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            if body is not None:
                f.write(body)
        tmp.append(path)
        return path

    try:
        use_stdin = "${INPUT}" not in cfg.command
        if not use_stdin:
            path = temp(".in", ndjson_in)
            argv = [a.replace("${INPUT}", path) for a in argv]
        out_file = None
        if "${OUTPUT}" in cfg.command:
            out_file = temp(".out")
            argv = [a.replace("${OUTPUT}", out_file) for a in argv]
        env = dict(os.environ)
        env.update(dict(cfg.env))
        proc = subprocess.run(
            argv,
            input=ndjson_in if use_stdin else None,
            capture_output=True,
            text=True,
            env=env,
            timeout=cfg.timeout_s,
        )
        if proc.returncode != 0:
            raise RuntimeError(
                f"external transformer (batch): command failed "
                f"(rc={proc.returncode}): {proc.stderr[-500:]}"
            )
        if out_file is not None:
            with open(out_file, encoding="utf-8") as f:
                body = f.read()
        else:
            body = proc.stdout
        lines = [ln for ln in body.splitlines() if ln.strip()]
        if len(lines) != len(rows):
            raise RuntimeError(
                f"external transformer (batch): expected "
                f"{len(rows)} NDJSON output lines, got {len(lines)}"
            )
        out = []
        for (r, c, meta), ln in zip(rows, lines):
            doc = json.loads(ln)
            new_meta = {
                k: [str(x) for x in (v if isinstance(v, list) else [v])]
                for k, v in (doc.get("metadata") or {}).items()
            }
            out.append((
                doc.get("content", c),
                apply_on_set(meta, new_meta, cfg.on_set),
            ))
        return out
    finally:
        for p in tmp:
            try:
                os.unlink(p)
            except OSError:
                pass


def external_transform(docs: DataFrame, cfg: ExternalConfig) -> DataFrame:
    """Run every document through the external program.

    Input columns: reference (string), content (string), meta
    (map<string, array<string>>, nullable). Output: same three, with
    transformed content and merged metadata.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = pdf["reference"].tolist()
            contents = pdf["content"].tolist()
            metas = (
                pdf["meta"].tolist()
                if "meta" in pdf.columns
                else [None] * len(pdf)
            )
            mdicts = [
                {k: list(v) for k, v in (dict(m) if m else {}).items()}
                for m in metas
            ]
            if cfg.batch_mode:
                results = run_external_batch(
                    cfg,
                    [
                        (r, c or "", m)
                        for r, c, m in zip(refs, contents, mdicts)
                    ],
                )
                new_c = [c for c, _ in results]
                new_m = [m for _, m in results]
            else:
                new_c, new_m = [], []
                for ref, c, meta in zip(refs, contents, mdicts):
                    nc, nm = run_external(cfg, ref, c or "", meta)
                    new_c.append(nc)
                    new_m.append(nm)
            yield pd.DataFrame(
                {"reference": refs, "content": new_c, "meta": new_m}
            )

    return docs.mapInPandas(run, schema=EXTERNAL_SCHEMA)
