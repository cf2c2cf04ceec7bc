"""In-process microbench of the fused invert+pack kernel on one
partition-sized doc slice (no Spark). Times _invert_chunk-equivalent
inversion and _emit_blocks_arrow separately."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.corpus import _zipf_probs, _doc_text  # noqa: E402
from search_engine_spark.functions.tokenizer import tokenize_text  # noqa: E402
from search_engine_spark.operators import blocks as B  # noqa: E402

N_DOCS = int(os.environ.get("MB_DOCS", "25000"))
probs = _zipf_probs()

t0 = time.time()
texts = [_doc_text(i, probs)[0] for i in range(N_DOCS)]
print(f"gen {time.time()-t0:.2f}s")

t0 = time.time()
tok_lists = [tokenize_text(t) for t in texts]
print(f"tokenize {time.time()-t0:.2f}s")

doc_ids = np.arange(N_DOCS, dtype=np.int64)

import pyarrow as pa  # noqa: E402

# invert (chunked like the kernel)
chunk = int(os.environ.get("MB_CHUNK", "2500"))
invert = getattr(B, "_invert_chunk", None)
t0 = time.time()
# replicate invert via invert_pack internals: call the module-level fn if
# present, else inline the same math (keep in sync with blocks.py)
from search_engine_spark.operators.blocks import codec, tf_norm_np  # noqa

def invert_chunk(doc_ids, tok_lists, tf_cap=2048):
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists))
    total = int(lens.sum())
    flat = pa.array([t for toks in tok_lists for t in toks], type=pa.string())
    d = flat.dictionary_encode()
    tidx = d.indices.to_numpy().astype(np.int64)
    vocab = d.dictionary
    doc_rep = np.repeat(np.arange(len(doc_ids), dtype=np.int64), lens)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(total, dtype=np.int64) - starts[doc_rep]
    order = np.lexsort((pos, doc_rep, tidx))
    gt, gd, gp = tidx[order], doc_rep[order], pos[order]
    newgrp = np.r_[True, (gt[1:] != gt[:-1]) | (gd[1:] != gd[:-1])]
    gstart = np.flatnonzero(newgrp)
    gend = np.r_[gstart[1:], total]
    raw_tf = gend - gstart
    tf = np.minimum(raw_tf, tf_cap).astype(np.int64)
    grp_id = np.cumsum(newgrp) - 1
    within = np.arange(total, dtype=np.int64) - gstart[grp_id]
    keep = within < tf[grp_id]
    pos_vals = gp[keep].astype(np.uint64)
    pos_bytes = np.frombuffer(codec.vb_encode(pos_vals), dtype=np.uint8)
    blens = codec.vb_lengths(pos_vals)
    byte_cum = np.zeros(len(pos_vals) + 1, dtype=np.int64)
    np.cumsum(blens, out=byte_cum[1:])
    val_off = np.zeros(len(tf) + 1, dtype=np.int64)
    np.cumsum(tf, out=val_off[1:])
    return (vocab, gt[gstart], doc_ids[gd[gstart]].astype(np.int64), tf,
            lens[gd[gstart]], pos_bytes, byte_cum[val_off])

got = invert_chunk(doc_ids, tok_lists)
print(f"invert(single chunk) {time.time()-t0:.2f}s; entries={len(got[1])}")

vocab, e_term, e_doc, e_tf, e_dl, pos_bytes, entry_boff = got

t0 = time.time()
nb = 0
for rb in B._emit_blocks_arrow(e_term, vocab, e_doc, e_tf, e_dl, pos_bytes, entry_boff, 128):
    nb += rb.num_rows
print(f"emit_blocks_arrow {time.time()-t0:.2f}s; blocks={nb}")
