"""diffmining_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of ysig/diff-mining.

"Diffusion Models as Data Mining Tools" (ECCV 2024) re-designed TPU-first:
pure-functional SD-v1.5 stack (UNet + VAE + CLIP text), batched pjit typicality
sweeps, JAX mining ops, and the reference's applications/baselines.

Layer map (mirrors SURVEY.md §1, rebuilt idiomatically):
  models/       SD-v1.5 UNet (with feature taps), VAE, CLIP text/vision, tokenizer
  diffusion/    DDPM/DDIM schedule math + samplers as pure functions
  ops/          Pallas/XLA kernels: attention, pooling, k-means, HOG, SVM
  typicality/   the typicality engine, artifact store, mining/clustering
  finetuning/   SD finetuning trainers (cars/ftt/geo/places/xray)
  applications/ PnP translation, parallel-dataset mining, X-ray localization
  baselines/    Doersch-2012 HOG+SVM, CLIP patch ranking
  parallel/     device mesh / sharding helpers
  utils/        weight conversion, images, artifacts
"""

__version__ = "0.1.0"
