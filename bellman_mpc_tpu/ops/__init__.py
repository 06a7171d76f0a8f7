from .domain import EvaluationDomain, distribute_powers, domain_size_for, ntt

__all__ = ["EvaluationDomain", "distribute_powers", "domain_size_for", "ntt"]
