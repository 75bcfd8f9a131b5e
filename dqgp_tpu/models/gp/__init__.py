from .posterior import gp_posterior_from_grams, masked_nll_and_grad, predict_quantum_gp
from .cv import k_fold_cross_validation_consensus, kfold_pad_indices
from .metrics import evaluate_predictions, nlpd
from .noise import NoiseFitResult, fit_noise_std
