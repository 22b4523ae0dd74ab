from probing_rag_tpu.ops.sparse import bm25_search_padded, postings_gather, sorted_segment_topk

__all__ = ["bm25_search_padded", "postings_gather", "sorted_segment_topk"]
