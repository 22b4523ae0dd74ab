#!/usr/bin/env bash
# Dataset download pipeline — the equivalent of the reference's
# download/download.sh + download/raw_data.sh (SURVEY.md C24). Fetches the
# five QA eval sets + retrieval corpora into raw_data/ with the directory
# layout probing_rag_tpu.data.qa.dataset_path expects.
#
# Run on a machine with network access; the TPU build environment is
# zero-egress.
set -euo pipefail
RAW=${1:-raw_data}
mkdir -p "$RAW"/{nq,trivia,hotpotqa,2wikimultihopqa,musique,iirc,wiki}

# DPR biencoder QA files (NQ, TriviaQA) + Wikipedia passage table
for split in train dev; do
  wget -nc -O "$RAW/nq/biencoder-nq-$split.json.gz" \
    "https://dl.fbaipublicfiles.com/dpr/data/retriever/biencoder-nq-$split.json.gz"
  wget -nc -O "$RAW/trivia/biencoder-trivia-$split.json.gz" \
    "https://dl.fbaipublicfiles.com/dpr/data/retriever/biencoder-trivia-$split.json.gz"
done
gunzip -kf "$RAW"/nq/*.gz "$RAW"/trivia/*.gz
wget -nc -O "$RAW/wiki/psgs_w100.tsv.gz" \
  "https://dl.fbaipublicfiles.com/dpr/wikipedia_split/psgs_w100.tsv.gz"
gunzip -kf "$RAW/wiki/psgs_w100.tsv.gz"

# HotpotQA QA files + wiki abstracts corpus
wget -nc -O "$RAW/hotpotqa/hotpot_train_v1.1.json" \
  "http://curtis.ml.cmu.edu/datasets/hotpot/hotpot_train_v1.1.json"
wget -nc -O "$RAW/hotpotqa/hotpot_dev_distractor_v1.json" \
  "http://curtis.ml.cmu.edu/datasets/hotpot/hotpot_dev_distractor_v1.json"
wget -nc -O "$RAW/hotpotqa/enwiki-20171001-pages-meta-current-withlinks-abstracts.tar.bz2" \
  "https://nlp.stanford.edu/projects/hotpotqa/enwiki-20171001-pages-meta-current-withlinks-abstracts.tar.bz2"
tar -xjf "$RAW/hotpotqa/enwiki-20171001-pages-meta-current-withlinks-abstracts.tar.bz2" -C "$RAW/hotpotqa/"

# 2WikiMultihopQA
wget -nc -O "$RAW/2wikimultihopqa/data.zip" \
  "https://www.dropbox.com/s/ms2m13252h6xubs/data_ids_april7.zip?dl=1"
unzip -o "$RAW/2wikimultihopqa/data.zip" -d "$RAW/2wikimultihopqa/"

# MuSiQue (Google Drive; needs gdown)
gdown --id 1tGdADlNjWFaHLeZZGShh2IRcpO6Lv24h -O "$RAW/musique/musique_v1.0.zip" || \
  echo "musique: install gdown or fetch musique_v1.0.zip manually"
unzip -o "$RAW/musique/musique_v1.0.zip" -d "$RAW/musique/" || true

# IIRC
wget -nc -O "$RAW/iirc/iirc_train_dev.tgz" \
  "https://iirc-dataset.s3.us-west-2.amazonaws.com/iirc_train_dev.tgz"
tar -xzf "$RAW/iirc/iirc_train_dev.tgz" -C "$RAW/iirc/"
wget -nc -O "$RAW/iirc/context_articles.tar.gz" \
  "https://iirc-dataset.s3.us-west-2.amazonaws.com/context_articles.tar.gz"
tar -xzf "$RAW/iirc/context_articles.tar.gz" -C "$RAW/iirc/"

echo "datasets downloaded to $RAW/"
