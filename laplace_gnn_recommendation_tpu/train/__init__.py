"""Training/eval pipelines: LightGCN, hetero encoder-decoder, PinSAGE."""
