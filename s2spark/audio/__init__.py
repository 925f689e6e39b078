"""Audio payload modality: opaque binary + typed metadata columns
(mirrors s2spark.image).  `wav` is a real pure-NumPy RIFF/PCM16 codec;
`ops` holds the Arrow-batched synth / feature kernels."""
