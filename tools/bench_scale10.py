#!/usr/bin/env python
"""Round-9 scale proof: input linearity at 10x + PDF-sink memory bounds.

Two claims the 100-TB story rests on, measured in one probed window:

1. **Extraction input linearity** (re-run of the pinned r7 10x row with
   the r8/r9 compiled kernels): the same local[32] plan at 600 vs 6000
   docs — per-page throughput must hold or RISE with corpus size
   (fixed costs amortize; any superlinear wall growth would be a
   scale-killer).

2. **PDF-sink memory boundedness**: `job.py --input-format imagestack
   --output-format pdf` (the full MRC recode product through the
   sharded checkpoint protocol) at 1x/4x/8x doc counts, recording wall,
   pages/s and the PEAK RSS of the whole process tree (JVM + every
   Python worker, sampled from /proc at 200 ms).  The sink holds one
   doc per grouped-map task — peak memory must be ~flat in corpus size;
   growth linear in docs would OOM a real executor long before 100 TB.

Writes BENCH/scale10_r9.json and prints the report JSON.
Probe-gated like every scaling write (--force overrides).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _tree_rss_kb(pid: int) -> int:
    """Sum VmRSS of pid + all descendants (one /proc pass)."""
    children: dict[int, list[int]] = {}
    rss: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        p = int(d)
        try:
            with open(f"/proc/{d}/status") as fh:
                ppid = r = 0
                for line in fh:
                    if line.startswith("PPid:"):
                        ppid = int(line.split()[1])
                    elif line.startswith("VmRSS:"):
                        r = int(line.split()[1])
        except OSError:
            continue
        children.setdefault(ppid, []).append(p)
        rss[p] = r
    total, stack = 0, [pid]
    while stack:
        p = stack.pop()
        total += rss.get(p, 0)
        stack.extend(children.get(p, []))
    return total


def build_imagestack_parquet(n_docs: int, out_dir: str) -> int:
    """(doc_id, page_idx, image, hocr) parquet of n_docs x 2 pages of
    612x792-ish paper-like rasters (TIFF-LZW + PNG) — the job.py
    imagestack front-door shape.  Returns page count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from archive_pdf_tools_spark.corpus.hocrgen import synth_hocr
    from archive_pdf_tools_spark.kernels.pngcodec import encode_png
    from archive_pdf_tools_spark.kernels.tiffcodec import encode_tiff

    rng = np.random.default_rng(23)
    ids, idxs, imgs, hocrs = [], [], [], []
    for d in range(n_docs):
        hocr = None
        if d % 2 == 0:
            h = synth_hocr(f"doc {d} alpha beta gamma", words_per_page=5)
            hocr = h.encode() if isinstance(h, str) else h
        for p in range(2):
            w, h2 = 612, 792
            img = np.full((h2, w), 230, np.uint8)
            for r in range(30, h2 - 30, 28):
                img[r:r + 12, 30:w - 30] = rng.integers(15, 60)
            img = np.clip(img.astype(np.int16)
                          + rng.integers(-5, 6, (h2, w)),
                          0, 255).astype(np.uint8)
            blob = (encode_tiff(img, compression="lzw") if p == 0
                    else encode_png(img))
            ids.append(f"d{d:04d}")
            idxs.append(p)
            imgs.append(bytes(blob))
            hocrs.append(hocr if p == 0 else None)
    os.makedirs(out_dir, exist_ok=True)
    table = pa.table({
        "doc_id": ids, "page_idx": pa.array(idxs, pa.int32()),
        "image": pa.array(imgs, pa.binary()),
        "hocr": pa.array(hocrs, pa.binary())})
    # several files + small row groups: one giant single-row-group
    # binary file tripped parquet's vectored-IO future timeout under
    # host contention at the 480-doc size (observed rc=1)
    per_file = max(64, len(ids) // 8)
    for k, start in enumerate(range(0, len(ids), per_file)):
        pq.write_table(table.slice(start, per_file),
                       os.path.join(out_dir, f"part-{k}.parquet"),
                       row_group_size=32)
    return len(ids)


def run_pdf_sink(n_docs: int, cores: int = 8) -> dict:
    """One job.py recode run over a fresh imagestack table; returns
    wall, pages/s and peak process-tree RSS."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix=f"scale10_{n_docs}_")
    try:
        inp = os.path.join(work, "in")
        out = os.path.join(work, "out")
        n_pages = build_imagestack_parquet(n_docs, inp)
        env = dict(os.environ,
                   PYSPARK_PYTHON=sys.executable,
                   SPARK_GRAFT_BENCH_WAIT_SEC="0")
        t0 = time.perf_counter()
        # stdout goes to a file, not a PIPE: the sampling loop below
        # never drains a pipe, and a chatty child would block on write
        # and deadlock the poll loop
        import pyspark
        spark_submit = os.path.join(os.path.dirname(pyspark.__file__),
                                    "bin", "spark-submit")
        log = os.path.join(work, "job.stdout")
        errlog = os.path.join(work, "job.stderr")
        with open(log, "w") as lf, open(errlog, "w") as ef:
            proc = subprocess.Popen(
                [spark_submit, "--master", f"local[{cores}]",
                 # a realistic executor heap: the default 1g dies on
                 # the per-doc blob shuffle past ~25k pages, which
                 # would measure spark-submit's default, not the sink
                 "--driver-memory", "4g",
                 "--conf",
                 "spark.hadoop.parquet.hadoop.vectored.io.enabled="
                 "false",
                 os.path.join(REPO, "job.py"),
                 "--input", inp, "--input-format", "imagestack",
                 "--output-format", "pdf", "--output", out,
                 "--shards", "4", "--partitions", str(cores * 2)],
                cwd=REPO, env=env,
                stdout=lf, stderr=ef, text=True)
            peak_kb = 0
            while proc.poll() is None:
                peak_kb = max(peak_kb, _tree_rss_kb(proc.pid))
                time.sleep(0.2)
        wall = time.perf_counter() - t0
        if proc.returncode != 0:
            with open(errlog) as ef:
                tail = ef.read()[-1500:]
            raise RuntimeError(
                f"job.py failed rc={proc.returncode}\n{tail}")
        with open(log) as lf:
            manifest = json.loads(lf.read().strip().splitlines()[-1])
        return {"docs": n_docs, "pages": n_pages,
                "wall_sec": round(wall, 2),
                "pages_per_sec": round(n_pages / wall, 2),
                "peak_tree_rss_mb": round(peak_kb / 1024),
                "manifest": manifest}
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_extract(n_docs: int, sf_dir: str, cores: int = 32) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--extract-only", str(cores), sf_dir, str(n_docs)],
        capture_output=True, text=True, check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    from bench import probe_window

    force = "--force" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    max_wait = float(os.environ.get("SPARK_GRAFT_SCALE_WAIT_SEC", "900"))
    probe = probe_window()
    waited = 0.0
    while not probe["clean"] and not force and waited < max_wait:
        time.sleep(60)
        waited += 60
        probe = probe_window()
    print(json.dumps({"probe": probe, "waited_sec": waited}))
    if not probe["clean"] and not force:
        print("window dirty; refusing to record (--force overrides)")
        return 1

    report = {"probe": probe}

    # 1. extraction input linearity at fixed cores (the r7 pinned row,
    #    re-measured with the compiled kernels)
    lin = {}
    for n in (600, 6000):
        r = run_extract(n, sf_dir)
        lin[str(n)] = {"pages": r["pages"], "wall_sec": r["sec"],
                       "pages_per_sec": r["pages_per_sec"]}
        print(f"extract {n} docs: {json.dumps(lin[str(n)])}")
    report["extract_linearity"] = lin

    # 2. PDF sink: wall + peak tree RSS at 1x/4x/8x docs (r10: plus a
    #    steady-state row — --sink-docs overrides, e.g. 60,240,480,2000
    #    puts the largest run at 4000 pages, past the fixed-overhead
    #    regime where pages/s was still rising)
    docs_list = (60, 240, 480)
    if "--sink-docs" in sys.argv:
        docs_list = tuple(
            int(t) for t in
            sys.argv[sys.argv.index("--sink-docs") + 1].split(","))
    sink = []
    for n in docs_list:
        row = run_pdf_sink(n)
        sink.append(row)
        print(f"pdf sink {n} docs: {json.dumps(row)}")
    report["pdf_sink"] = sink
    first, last = sink[0], sink[-1]
    report["pdf_sink_rss_growth"] = round(
        last["peak_tree_rss_mb"] / max(first["peak_tree_rss_mb"], 1), 3)

    out = os.path.join(REPO, "BENCH",
                       os.environ.get("SPARK_GRAFT_SCALE10_OUT",
                                      "scale10_r9.json"))
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
