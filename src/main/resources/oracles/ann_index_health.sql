SELECT CAST(cell AS INT) AS cell, CAST(cell_rows AS BIGINT) AS cell_rows, CAST(skew AS DOUBLE) AS skew
FROM (VALUES
(1,233,4.66),
(9,117,2.34),
(12,236,4.72),
(13,88,1.76)
) AS t(cell, cell_rows, skew)
ORDER BY cell