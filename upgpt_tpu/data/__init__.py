from upgpt_tpu.data.tokenizer import CLIPTokenizer  # noqa: F401
