from byogan_tpu.ops.fused import noise_lrelu_adain  # noqa: F401
