from .perplexity import causal_lm_loss, evaluate_perplexity

__all__ = ["evaluate_perplexity", "causal_lm_loss"]
