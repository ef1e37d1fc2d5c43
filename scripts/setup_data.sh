#!/usr/bin/env bash
# Fetch the DSNet preprocessed datasets (the reference's setup.sh source).
# Run on a machine with egress; this sandbox has none.
set -euo pipefail
mkdir -p data
wget -O dsnet_datasets.zip \
    "https://www.dropbox.com/s/tdknvkpz1jp6iuz/dsnet_datasets.zip"
unzip dsnet_datasets.zip -d data
rm dsnet_datasets.zip
echo "datasets in ./data; the summarizer_* h5 files (with user_scores) are"
echo "what vidsum_tpu.data.PATH expects for summe/tvsum."
