#!/bin/sh
# Fetch the public cl100k_base rank table (the tokenizer the reference
# pipeline uses: domain/splitters/token_counter.py:25-34). The URL is the
# one published in tiktoken's own source (tiktoken_ext/openai_public.py).
#
# This sandbox has no egress, so the file cannot ship with the repo; run
# this wherever network exists, drop the file at tools/fixtures/, and
# Cl100kParitySpec activates automatically (it is skipped while the file
# is absent) — asserting byte-exact token ids against published tiktoken
# outputs, which closes SURVEY §7's chunk-boundary-parity risk.
set -eu
cd "$(dirname "$0")/fixtures"
curl -fLO "https://openaipublic.blob.core.windows.net/encodings/cl100k_base.tiktoken"
echo "fetched $(wc -l < cl100k_base.tiktoken) ranks"
