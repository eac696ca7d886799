def rhat_nested(*a, **k):
    raise NotImplementedError
