import os, sys, tempfile, json
sys.path.insert(0,'/root/repo')
sys.path.insert(0,'/root/repo/tests')
import pyarrow as pa, pyarrow.parquet as pq
from msstreamingstack_spark.session import get_spark
from msstreamingstack_spark.streaming.corpus import run_corpus_ingest

spark = get_spark(app_name="soak-instrument", cpus=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix="soak_")
EVAL_TEXT = "zebra yak xylophone walrus vulture tiger snake quail"

def _write_drop(path, rows, mtime):
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"]*len(rows), pa.string()),
        "source": pa.array(["crawl"]*len(rows), pa.string()),
        "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
    })
    pq.write_table(tbl, str(path))
    os.utime(path, (mtime, mtime))

rng_words = [f"w{i:03d}" for i in range(80)]
drops = os.path.join(tmp, "drops"); os.makedirs(drops)
n_batches, docs_per_batch, doc_id = 50, 8, 0
for b in range(n_batches):
    rows=[]
    for j in range(docs_per_batch):
        start=(b*13+j*7)%80; stride=3+(b+j)%5
        words=[rng_words[(start+k*stride)%80] for k in range(12)]
        words.append(f"u{doc_id}")
        rows.append((doc_id, " ".join(words))); doc_id+=1
    _write_drop(os.path.join(drops, f"d{b:03d}.parquet"), rows, 1_700_000_000+b)

eval_docs = spark.createDataFrame([(999_999, EVAL_TEXT, "en", "bench", len(EVAL_TEXT))],
    ["doc_id","text","lang","source","n_chars"])
prev = spark.conf.get("spark.sql.shuffle.partitions")
spark.conf.set("spark.sql.shuffle.partitions","4")
q = run_corpus_ingest(spark, drops, eval_docs,
    os.path.join(tmp,"accept"), os.path.join(tmp,"reject"),
    checkpoint_dir=os.path.join(tmp,"cp"),
    digest_store_dir=os.path.join(tmp,"digests"),
    neardup_store_dir=os.path.join(tmp,"sigs"),
    lm_store_dir=os.path.join(tmp,"lm"))
q.awaitTermination(600)
progress=[p for p in (q.recentProgress or []) if p.get("numInputRows",0)>0]
q.stop()
spark.conf.set("spark.sql.shuffle.partitions", prev)
durs=[p["durationMs"]["triggerExecution"] for p in progress]
print("n_progress", len(progress))
print("durs", json.dumps(durs))
