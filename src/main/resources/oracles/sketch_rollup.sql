SELECT CAST(l_returnflag AS VARCHAR) AS l_returnflag, CAST(n_partials AS BIGINT) AS n_partials, CAST(rolled_estimate AS DOUBLE) AS rolled_estimate
FROM (VALUES
('A',12,11198.496803606333),
('N',12,11153.083271282192),
('R',12,11063.777503233505)
) AS t(l_returnflag, n_partials, rolled_estimate)
ORDER BY l_returnflag