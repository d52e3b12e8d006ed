"""Drive the engine end-to-end through its public API, as a user would."""
import os, sys, time, json, shutil

sys.path.insert(0, "/root/repo")
import ray
import ray.data

ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
ray.data.DataContext.get_current().enable_progress_bars = False

from document_retrieval_ray.sources.synth import write_corpus
from document_retrieval_ray.pipelines.build_index import build_index
from document_retrieval_ray.pipelines.query import bm25_search, cosine_search, to_submission
from document_retrieval_ray.config import BM25Config, IndexConfig, TokenizerConfig

work = "/tmp/drive_engine_work"
shutil.rmtree(work, ignore_errors=True)
paths = write_corpus(os.path.join(work, "corpus"), num_docs=800, seed=11)
index_dir = os.path.join(work, "index")

t0 = time.time()
manifests = build_index(paths["documents"], index_dir, cfg=IndexConfig(hot_term_threshold=200, salt_shift=6))
t1 = time.time()
print("BUILD OK in %.1fs; langs=%s" % (t1 - t0, sorted(manifests)))
for l, m in sorted(manifests.items()):
    print(f"  {l}: docs={m['n_docs']} terms={m['n_terms']} postings={m['n_postings']} avgdl={m['avgdl']:.1f}")

# re-run → must skip everything (resume)
t2 = time.time()
again = build_index(paths["documents"], index_dir, cfg=IndexConfig(hot_term_threshold=200, salt_shift=6))
print("RESUME no-op in %.2fs (was %.1fs)" % (time.time() - t2, t1 - t0))

qds = ray.data.read_parquet(paths["queries"])
res = bm25_search(qds, index_dir, cfg=BM25Config.reference())
pdf = res.to_pandas().sort_values(["query_id", "rank"])
print("QUERY OK: result rows=%d distinct queries=%d" % (len(pdf), pdf.query_id.nunique()))
print(pdf.head(12).to_string())

sub = to_submission(res).to_pandas().sort_values("query_id")
print("SUBMISSION rows=%d sample:" % len(sub))
print(sub.head(3).to_string())

cos = cosine_search(qds, index_dir, rerank=True, candidates=50).to_pandas()
print("COSINE+RERANK rows=%d" % len(cos))

# probe: unknown language + empty/garbage queries must not crash
import pandas as pd
probe = ray.data.from_pandas(pd.DataFrame({
    "query_id": ["p1", "p2", "p3"],
    "query": ["entok100 entok120", "", "!!! ???"],
    "lang": ["xx", "en", "en"],
}))
pres = bm25_search(probe, index_dir).to_pandas()
print("PROBE unknown-lang/empty/garbage → rows=%d (expect 0)" % len(pres))

# probe: WAND path through the public pipeline
wres = bm25_search(qds, index_dir, method="wand").to_pandas()
tres = bm25_search(qds, index_dir, method="taat").to_pandas()
merge = wres.merge(tres, on=["query_id", "rank"], suffixes=("_w", "_t"))
mismatch = (merge["score_x_w"] != merge["score_x_t"]).sum()
print("PROBE wand-vs-taat rows=%d score_x mismatches=%d" % (len(merge), int(mismatch)))

# probe: tombstone deletion + delete-aware compaction (pipelines/deletes)
from document_retrieval_ray.pipelines.deletes import delete_docs
from document_retrieval_ray.pipelines.incremental import compact_index

victims = sorted(set(tres["url"]))[:5]
n_tomb = delete_docs(index_dir, victims)
dres = bm25_search(qds, index_dir).to_pandas()  # auto-detects tombstones
leaked = set(dres["url"]) & set(victims)
print("PROBE delete: tombstoned=%d leaked-into-results=%d (expect 0)"
      % (n_tomb, len(leaked)))
cdir = os.path.join(work, "compacted")
compact_index(index_dir, cdir)
cres = bm25_search(qds, cdir).to_pandas()
cleaked = set(cres["url"]) & set(victims)
print("PROBE compact-deletes: rows=%d leaked=%d (expect 0)"
      % (len(cres), len(cleaked)))

ray.shutdown()
print("DRIVE COMPLETE")
