from .gram_kernel import pooled_gram_pallas, gram_pallas, PALLAS_AVAILABLE
