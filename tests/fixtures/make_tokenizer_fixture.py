"""Build the committed tokenizer fixture: a small sentencepiece-convention
tokenizer (BPE with the '▁' word-boundary marker and <0xHH> byte-fallback
pieces, like Gemma/Mistral vocabs) plus golden text->ids vectors.

Deterministic; rerun only to regenerate the fixture after intentional
changes. The goldens pin SentencePieceTokenizer's semantics: if encode/
decode/token_strings drift, tests/test_tokenizer_goldens.py fails.
"""
import json
from pathlib import Path

from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

HERE = Path(__file__).parent

CORPUS = [
    "Question: What is the capital of France?\nRationale: France's capital is Paris.\nAnswer: Paris",
    "Question: Who was the first president?\nAnswer: George Washington",
    "passage 1: The Nile is the longest river in Africa.\n\npassage 2: Honey never spoils.",
    "Follow the examples and answer the question after thinking step by step.",
    "the quick brown fox jumps over the lazy dog",
] * 20

tok = Tokenizer(models.BPE(unk_token=None, byte_fallback=True))
tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁", prepend_scheme="always")
tok.decoder = decoders.Sequence(
    [decoders.ByteFallback(), decoders.Metaspace(replacement="▁", prepend_scheme="always")]
)
trainer = trainers.BpeTrainer(
    vocab_size=512,
    special_tokens=["<pad>", "<bos>", "<eos>"],
    initial_alphabet=[],
    # byte-fallback pieces in the vocab, like sentencepiece --byte_fallback
    limit_alphabet=1000,
)
tok.train_from_iterator(CORPUS, trainer)
# inject byte pieces (sentencepiece puts <0xHH> in-vocab for fallback)
tok.add_tokens([f"<0x{b:02X}>" for b in range(256)])
tok.save(str(HERE / "tokenizer.json"))

from transformers import PreTrainedTokenizerFast

hf = PreTrainedTokenizerFast(
    tokenizer_file=str(HERE / "tokenizer.json"),
    bos_token="<bos>", eos_token="<eos>", pad_token="<eos>",
)

texts = [
    "What is the capital of France?",
    "Answer: Paris\n\nQuestion:",
    "step by step thinking",
    "passage 1: The Nile is the longest river in Africa.",
    "\n\n",
]
goldens = {t: hf.encode(t, add_special_tokens=False) for t in texts}
(HERE / "tokenizer_goldens.json").write_text(json.dumps(goldens, indent=1))
print("vocab size", hf.vocab_size, len(hf))
print(json.dumps(goldens, indent=1)[:400])
