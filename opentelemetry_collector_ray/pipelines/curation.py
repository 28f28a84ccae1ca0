"""End-to-end corpus curation — the documents-table flagship: screen
out benchmark-contaminated documents, mix languages to a target ratio,
and pack the survivors into fixed-capacity training sequences. One
composition of the engine's LLM-data operators, each stage keeping its
own scale shape:

- contamination screen (``stages/contamination.py``): broadcast phrase
  hashes, streaming probe+verify, then a streaming filter on the flag —
  the document text flows through ONE pass, nothing shuffles;
- language mixing (``stages/mixing.py``): bounded-class count pass over
  the SURVIVORS + deterministic id-mod filter (rates computed on the
  post-screen corpus — screening first means the mixture ratio holds in
  the OUTPUT, not the raw input);
- sequence packing (``stages/packing.py``): two-pass distributed prefix
  sum over the kept docs in id order → ``chunk_id = offset // capacity``.

The whole pipeline is integer-deterministic, so a single SQL oracle
reproduces it end to end (q:``docs_curation`` in ``__ray_entry__``).
Filtering preserves the source's id-range block structure, which is
exactly the range-partitioned-input contract ``ordered_prefix_sum``
validates (a violation fails loudly, never silently).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def build_curation(make_docs, phrases: list[str],
                   weights: dict[str, int], capacity: int = 2048,
                   id_col: str = "doc_id", text_col: str = "text",
                   class_col: str = "lang",
                   persist: str = "none") -> ray.data.Dataset:
    """``make_docs`` is a zero-arg factory for the documents dataset
    (must include id, text and class columns). Returns the packed
    survivors: (id, class, n_tokens, start_offset, chunk_id).

    COST CONTRACT: the screen+mix+count chain is re-executed by the
    packing passes under the default ``persist="none"`` (fine at test
    scale); for a large corpus pass ``persist=<dir>`` so the chain runs
    ONCE and packing's two passes re-read parquet
    (``stages.bucketing.persisted_factory``)."""
    from ..functions.text import token_count
    from ..stages.mixing import mix_by_class
    from ..stages.packing import pack_chunks

    # flag_contaminated returns only (id, flag, hits); the filter must
    # keep the full rows, so run the stage inline over full batches.
    # INSTANCE mode (stateless task pool, tables in the closure — they
    # are a few sorted hash arrays) rather than an actor pool: the
    # chain executes several times across the mixing/packing passes and
    # per-execution actor spin-up dominated the wall (19 s → ~3 s at
    # sf0.1 with instance mode + the persisted screen below).
    from ..stages.contamination import (ContaminationStage, _normalize,
                                        _phrase_table)

    tables = _phrase_table(list(phrases))
    normset = [_normalize(p) for p in phrases]

    class ScreenKeep(ContaminationStage):
        def __call__(self, t: pa.Table) -> pa.Table:
            flags = super().__call__(t)
            return t.filter(pc.invert(flags.column("contaminated")))

    stage = ScreenKeep(tables=tables, phrase_set=normset,
                       text_col=text_col, id_col=id_col)

    def screen_batches(docs: ray.data.Dataset) -> ray.data.Dataset:
        return docs.map_batches(stage, batch_format="pyarrow")

    if persist != "none":
        # run the screen ONCE; every mixing/packing pass reuses it
        _screened = screen_batches(make_docs()).materialize()

        def screened_factory():
            return _screened
    else:
        def screened_factory():
            return screen_batches(make_docs())

    def mixed():
        return mix_by_class(screened_factory, class_col, weights,
                            id_col=id_col)

    def counted():
        return mixed().map_batches(
            lambda t: pa.table({
                id_col: t.column(id_col),
                class_col: t.column(class_col),
                "n_tokens": token_count(t.column(text_col)).cast(
                    pa.int64())}),
            batch_format="pyarrow")

    return pack_chunks(counted, id_col, "n_tokens", capacity=capacity,
                       persist=persist)
