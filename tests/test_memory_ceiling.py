"""Per-task memory ceiling of the decode kernel (SURVEY O14, §4).

The 100x scale-up claim is that an executor task's peak memory is
bounded by the LARGEST SINGLE PAGE's working set (emission cache +
beam buffers + models), NOT by how many pages the task decodes:
decode_pages_kernel calls decode_document once per page row, and each
page's cache/buffers are garbage the moment its output row is built
(reference analog: DecoderEM.java:71-84 batches decodeBatchSize=32
lines to bound cache memory and even calls System.gc() between
batches; our per-page loop is the same ceiling without the gc hack).

This test PINS the ceiling instead of asserting it in prose: decode
the same long-line synthetic doc at 4 pages and at 40 pages in two
fresh subprocesses and require the 10x page count to move peak RSS by
at most a fraction of the measured multi-MB per-page working set —
i.e. pages are decoded, not accumulated.  A regression that keeps
per-page caches alive (e.g. holding `caches` across pages at the
kernel level) would add ~36x one page's cache to the 40-page run and
trip the bound immediately.
"""

import json
import multiprocessing as mp
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _decode_pages_rss(sf_dir: str, n_pages: int, out_q) -> None:
    """Child process: decode n_pages copies of a long-line page through
    decode_pages_kernel and report peak RSS (KiB) + per-page cache
    bytes.  Runs in its own process so ru_maxrss is a clean high-water
    mark for exactly this workload."""
    import resource

    import pandas as pd
    import pyarrow.parquet as pq

    from ocular_spark.decoder import build_emission_cache
    from ocular_spark.fixtures import build_models, render_text_line
    from ocular_spark.pipeline import (
        decode_pages_kernel,
        get_decoder,
        pack_line,
        unpack_line,
    )

    documents = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    bundle, char_strs = build_models(documents)

    # one LONG page: 8 lines x ~9 words — wider than any sf fixture
    # page, so the per-page working set dominates incidental noise
    words = [w for t in documents["text"].head(40) for w in str(t).split()]
    lines = [
        render_text_line(" ".join(words[8 * i : 8 * i + 9]))
        for i in range(8)
    ]
    page = [pack_line(im) for im in lines]

    # measure the single-page emission-cache working set (the claimed
    # ceiling driver) before decoding anything
    decoder = get_decoder(bundle)
    cache_bytes = sum(
        build_emission_cache(unpack_line(raw), decoder.stack).log_probs.nbytes
        for raw in page
    )

    pdf = pd.DataFrame(
        {
            "doc_id": ["memdoc"] * n_pages,
            "media_ref": ["mm-%02d" % i for i in range(n_pages)],
            "offset": list(range(n_pages)),
            "lines": [page] * n_pages,
        }
    )
    n_out = 0
    for out in decode_pages_kernel(bundle, char_strs)(iter([pdf])):
        n_out += len(out)
    peak_kib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    out_q.put(json.dumps({
        "n_out": n_out,
        "peak_kib": int(peak_kib),
        "cache_bytes": int(cache_bytes),
    }))


def _run_child(sf_dir: str, n_pages: int) -> dict:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_decode_pages_rss, args=(sf_dir, n_pages, q))
    p.start()
    try:
        res = json.loads(q.get(timeout=1200))
    finally:
        p.join(timeout=60)
        if p.is_alive():  # pragma: no cover
            p.terminate()
            p.join()
    return res


def test_kernel_peak_rss_independent_of_page_count(sf_dir):
    """Peak task RSS at 40 pages must sit within a small tolerance of
    peak RSS at 4 pages: decoding 10x the pages may not accumulate
    10x the caches.  Tolerance: half of ONE page's emission-cache
    bytes + 96 MiB allocator/interpreter slack — a kernel that kept
    per-page caches alive would exceed it ~70x over."""
    small = _run_child(sf_dir, 4)
    big = _run_child(sf_dir, 40)
    assert small["n_out"] == 4 and big["n_out"] == 40

    page_cache_mib = small["cache_bytes"] / 2**20
    # the working set must be non-trivial for the bound to mean much
    assert page_cache_mib > 2.0, page_cache_mib

    growth_mib = (big["peak_kib"] - small["peak_kib"]) / 1024.0
    allowed_mib = 0.5 * page_cache_mib + 96.0
    # a cache-accumulation regression adds ~36 pages x page_cache_mib
    assert growth_mib < allowed_mib, (
        f"peak RSS grew {growth_mib:.1f} MiB from 4->40 pages "
        f"(allowed {allowed_mib:.1f}; per-page cache {page_cache_mib:.1f} MiB)"
    )
