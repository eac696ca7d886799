def gelmandiag(*a, **k):
    raise NotImplementedError
def gelmandiag_multivariate(*a, **k):
    raise NotImplementedError
