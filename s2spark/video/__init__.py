"""Video payload modality: opaque binary + typed metadata columns.
`container` is a deterministic seekable frame container (PNG frames +
length table — a stand-in for a real codec, which this container
lacks; the Spark-side plumbing is real and tested); `ops` holds the
Arrow-batched synth / frame-sample kernels."""
