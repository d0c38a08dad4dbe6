"""Batched JAX feature extractors — TPU-native re-implementations of the
reference's per-frame/per-chunk GPU extractor loops (SURVEY.md §2.5):

- ``clip_vit``   : CLIP ViT-B/32 image encoder (visual stream, 512-d/s);
- ``cnn14``      : PANNs CNN14 audio tagger embeddings (audio stream, 2048-d/s);
- ``minilm``     : MiniLM-L6 sentence encoder (text stream, 384-d/s);
- ``audio_frontend``: STFT + log-mel in jnp (CNN14's input);
- ``whisper_jax``: full Whisper ASR (encoder + KV-cached decoder + timestamp
  greedy decode) on TPU — the reference's host-side GPU ASR stage, batched.

Each ships a torch-checkpoint converter so the reference's extractor weights
produce bit-comparable features.
"""
