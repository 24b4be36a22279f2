"""Script transformer / condition — the scripting ext point.

Re-expresses the reference's JSR-223 handlers from scratch
(importer/.../transformer/impl/ScriptTransformer.java:34-146,
condition/impl/ScriptCondition.java): a user-configured script runs
per document with the variables

    reference  — document reference string
    content    — document content string
    metadata   — dict[str, list[str]] (Properties analog; in-place
                 mutations are kept, matching the reference where
                 scripts set fields on the live Properties object)

and returns the modified content (transformer) or a truthy match
verdict (condition). The engine here is Python itself — the one
scripting runtime every Spark worker already has — instead of the
JVM's JavaScript/Lua/Velocity engines; a script is either a single
expression or a full function body containing ``return``.

Same trust model as the reference: the script is part of the
pipeline CONFIG, authored by the operator of the crawl (the
reference evaluates config scripts with no sandbox either) — never
feed untrusted document content into the script parameter.

Spark shape: compiled ONCE driver-side (syntax errors fail fast at
config time, like the reference's engine lookup), executed in
``mapInPandas`` batches worker-side.
"""

from __future__ import annotations

import textwrap
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .external import EXTERNAL_SCHEMA


def compile_script(script: str) -> Callable[[str, str, dict], object]:
    """Script text -> callable(reference, content, metadata).

    An expression compiles directly; anything else is wrapped as a
    function body (use ``return``). Compile errors raise here —
    config time — not on the executors.
    """
    import builtins as _builtins

    script = textwrap.dedent(script)
    # NOTE: the closures below must reference the builtins MODULE (a
    # by-reference pickle), never ``__builtins__`` — in an imported
    # module that name can be the raw builtins dict, which cloudpickle
    # would then serialize by value (and fail on any unpicklable entry
    # another library planted there).
    try:
        code = compile(script, "<script>", "eval")

        def run_expr(reference, content, metadata):
            return eval(  # noqa: S307 — operator-authored config
                code,
                {"__builtins__": _builtins},
                {
                    "reference": reference,
                    "content": content,
                    "metadata": metadata,
                },
            )

        return run_expr
    except SyntaxError:
        pass
    wrapped = (
        "def __script__(reference, content, metadata):\n"
        + textwrap.indent(script, "    ")
    )
    ns: dict = {"__builtins__": _builtins}
    exec(compile(wrapped, "<script>", "exec"), ns)  # noqa: S102
    return ns["__script__"]


def script_transform(docs: DataFrame, script: str) -> DataFrame:
    """Replace ``content`` with the script's return value; metadata
    mutations made by the script are kept (ScriptTransformer
    contract: the return value is the modified content).

    Input/output columns: reference, content,
    meta map<string, array<string>> (the ext-point doc schema shared
    with the external transformer).
    """
    fn = compile_script(script)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs = pdf["reference"].tolist()
            contents = pdf["content"].tolist()
            metas = (
                pdf["meta"].tolist()
                if "meta" in pdf.columns
                else [None] * len(pdf)
            )
            new_c, new_m = [], []
            for ref, c, m in zip(refs, contents, metas):
                meta = {
                    k: list(v)
                    for k, v in (dict(m) if m else {}).items()
                }
                out = fn(ref, c or "", meta)
                new_c.append("" if out is None else str(out))
                new_m.append(meta)
            yield pd.DataFrame(
                {"reference": refs, "content": new_c, "meta": new_m}
            )

    return docs.mapInPandas(run, schema=EXTERNAL_SCHEMA)


def script_condition(docs: DataFrame, script: str,
                     keep: bool = True) -> DataFrame:
    """Filter documents by the script's truthiness (ScriptCondition:
    the return value is the match verdict). ``keep=False`` inverts —
    drop matching docs."""
    fn = compile_script(script)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                yield pdf
                continue
            metas = (
                pdf["meta"].tolist()
                if "meta" in pdf.columns
                else [None] * len(pdf)
            )
            mask = []
            for ref, c, m in zip(
                pdf["reference"].tolist(), pdf["content"].tolist(), metas
            ):
                meta = {
                    k: list(v)
                    for k, v in (dict(m) if m else {}).items()
                }
                hit = bool(fn(ref, c or "", meta))
                mask.append(hit if keep else not hit)
            yield pdf[pd.Series(mask, index=pdf.index)]

    return docs.mapInPandas(run, schema=docs.schema)
