"""Device-side building blocks: spin-orbital slicing, fused CC step
(amplitude update + DIIS in one dispatch), and the Pallas triples kernel."""
