from probing_rag_tpu.pipeline.rag import AdaptiveRAGPipeline, RAGConfig, RAGResult

__all__ = ["AdaptiveRAGPipeline", "RAGConfig", "RAGResult"]
