SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars_main AS BIGINT) AS n_chars_main, CAST(n_lines_main AS BIGINT) AS n_lines_main, CAST(n_lines_all AS BIGINT) AS n_lines_all, CAST(head60 AS VARCHAR) AS head60, CAST(tail60 AS VARCHAR) AS tail60
FROM (VALUES
(0,211,3,9,'Doc 0
key agg row scan slow fast table value part hash value','ue fast spark a a the line sort table window table table key'),
(1,460,3,9,'Doc 1
batch window spark order data column agg join small li','can spark fast sort key agg query the group line table order'),
(2,300,3,9,'Doc 2
small fast slow filter value small value table the par','can slow small group fast column scan data group spark value'),
(3,201,3,9,'Doc 3
window merge spark merge batch table a big a join batc','agg small slow small stream customer group spark data vector'),
(4,304,3,9,'Doc 4
data query small row slow row data stream filter small',' spark window part agg the column line the data row customer'),
(5,367,3,9,'Doc 5
agg table spark hash sort key vector fast join value d','ig group stream small stream order small key scan group line'),
(6,131,3,9,'Doc 6
agg small scan table group scan order row merge scan p','an group fast
See the full guide for background and details:'),
(7,456,3,9,'Doc 7
batch window vector hash fast part window the stream k','oin big order scan customer scan order the customer key slow'),
(8,524,3,9,'Doc 8
the spark join stream a small order merge column group','an agg order fast row window slow group group spark part dup'),
(9,445,3,9,'Doc 9
order small line key filter column order the order par','m join key filter line merge hash join key group big a small'),
(10,269,3,9,'Doc 10
order scan agg batch a small stream value table merge','ndow part merge query agg big query a spark the the join key'),
(11,359,3,9,'Doc 11
the big data merge data spark merge stream part slow ','window group part filter fast data key part line a merge key'),
(12,402,3,9,'Doc 12
batch small fast slow a a order vector scan a group q','er join value stream key join fast order slow customer value'),
(13,401,3,9,'Doc 13
window query order value query hash agg the small agg','eam window small spark merge filter stream batch join vector'),
(14,549,3,9,'Doc 14
stream small agg the group stream line group group fa','ch join small table join part big filter query agg table key'),
(15,282,3,9,'Doc 15
order merge small table group batch key order custome','y small filter vector join table join spark row line key big'),
(16,144,3,9,'Doc 16
line vector order slow data column fast line batch co','an
See the full guide for background and details: table scan'),
(17,481,3,9,'Doc 17
key a small data filter column part row window table ',' key stream batch small row column sort agg vector fast line'),
(18,477,3,9,'Doc 18
merge small agg slow small value fast hash a sort str','customer data customer small customer order big window group'),
(19,111,3,9,'Doc 19
vector scan row filter vector sort query fast group a','t group a agg
See the full guide for background and details:'),
(20,448,3,9,'Doc 20
window part slow customer join the scan big window co','mer query window line vector row key the fast customer group'),
(21,272,3,9,'Doc 21
key order join customer batch row data customer vecto','filter batch customer scan slow window hash order a customer'),
(22,509,3,9,'Doc 22
slow sort small join column a group order line window','he query query group stream line spark spark the small order'),
(23,220,3,9,'Doc 23
filter slow the data customer sort agg query stream v','h hash big slow merge part data the filter window scan batch'),
(24,590,3,9,'Doc 24
sort a spark table stream sort data merge line slow t','w customer customer part join key big column vector a vector'),
(25,560,3,9,'Doc 25
merge fast query fast column fast agg small query cus','indow query value scan the batch window small fast key group'),
(26,117,3,9,'Doc 26
table small sort order small hash stream data big key','key group dup
See the full guide for background and details:'),
(27,400,3,9,'Doc 27
key small customer spark merge slow scan scan column ','can customer big line column order agg value a hash column a'),
(28,388,3,9,'Doc 28
query hash key line spark agg fast slow row key filte','fast big part column sort stream fast slow hash batch stream'),
(29,251,3,9,'Doc 29
table small window vector a the scan vector group fas','customer line a slow query scan data batch customer customer'),
(30,221,3,9,'Doc 30
key row sort small key a batch table batch spark hash','able stream order small fast vector the the window sort join'),
(31,305,3,9,'Doc 31
the a column batch customer value vector line group d','ter join stream customer small row part big line filter hash'),
(32,568,3,9,'Doc 32
table join row merge window window vector customer jo','filter sort row customer vector stream column spark customer'),
(33,301,3,9,'Doc 33
line column merge fast hash fast spark fast merge the','tomer scan query query a row sort sort slow line stream part'),
(34,220,3,9,'Doc 34
sort table merge row order scan small vector customer','batch merge row filter query stream slow spark order agg big'),
(35,507,3,9,'Doc 35
filter join join big agg key filter a a table big tab','roup query row customer line table customer row slow key key'),
(36,190,3,9,'Doc 36
stream value data value line merge customer line key ','ils: mer stream sort group batch stream slow window customer'),
(37,432,3,9,'Doc 37
data scan a stream small scan fast group part custome','the sort order customer agg order slow group slow agg column'),
(38,258,3,9,'Doc 38
merge group small line window customer slow agg order','ig table the scan join line line small spark customer a scan'),
(39,179,3,9,'Doc 39
small window sort row column spark the hash slow smal','nd and details: w spark small vector filter query join batch'),
(40,476,3,9,'Doc 40
order scan line hash line window column customer spar','h data slow hash hash slow big group group vector order hash'),
(41,391,3,9,'Doc 41
line group batch key merge join table batch spark col','am key big batch the value batch value key agg line sort key'),
(42,358,3,9,'Doc 42
group column key window join group window scan order ',' scan column fast window line customer sort batch row stream'),
(43,207,3,9,'Doc 43
stream group small the filter part scan slow fast joi','rk merge data part row group agg batch stream fast row query'),
(44,183,3,9,'Doc 44
data data sort agg scan value the hash column line fi','nd details: m a merge row line row stream value order filter'),
(45,486,3,9,'Doc 45
merge group part scan row value column batch the tabl',' big part merge table join row slow hash batch small dup dup'),
(46,546,3,9,'Doc 46
scan stream agg small customer merge customer value f','e vector query vector join scan small merge batch row vector'),
(47,278,3,9,'Doc 47
a column merge small value merge agg column value has','filter agg scan query fast stream scan scan order data batch'),
(48,219,3,9,'Doc 48
customer fast big line big stream hash merge agg spar','scan row line value group customer sort row filter sort part'),
(49,310,3,9,'Doc 49
query batch data batch slow key column scan sort vect','slow join part filter part small the spark hash table vector'),
(50,310,3,9,'Doc 50
slow value window column data slow value column join ','the row order merge spark hash group filter filter agg spark'),
(51,381,3,9,'Doc 51
order spark filter hash query hash hash window sort h','stream hash customer customer vector join sort data key hash'),
(52,117,3,9,'Doc 52
part join window part agg small column spark fast a t','a the big agg
See the full guide for background and details:'),
(53,245,3,9,'Doc 53
group slow table scan data part order value query par','e stream sort slow agg stream filter sort query value filter'),
(54,412,3,9,'Doc 54
batch a table small column the scan stream key spark ',' agg key query line spark big stream window query hash order'),
(55,251,3,9,'Doc 55
stream slow customer a row hash scan value scan a str',' row window batch table data value line fast sort batch hash'),
(56,603,3,9,'Doc 56
merge key part vector data order window spark row tab','line scan fast big batch stream window join the filter spark'),
(57,502,3,9,'Doc 57
hash the batch big scan a line stream a customer orde',' the batch filter vector order small slow order filter group'),
(58,443,3,9,'Doc 58
column stream spark hash group join key table join wi','rder filter data filter order fast group group big group dup'),
(59,172,3,9,'Doc 59
join hash group join group big batch customer slow da','ckground and details: small fast a fast line a agg slow join'),
(60,548,3,9,'Doc 60
key sort data scan big agg customer value vector key ',' column a hash key vector a scan agg part row filter the the'),
(61,364,3,9,'Doc 61
merge small small the order agg order table a order v','column scan a key batch agg table column agg value batch dup'),
(62,446,3,9,'Doc 62
group a order value fast customer merge table merge p','rt group key group key table part merge group join scan scan'),
(63,583,3,9,'Doc 63
scan small data slow scan query row slow big part fil',' window join slow a the slow big table stream part the group'),
(64,189,3,9,'Doc 64
join agg join a table hash big sort filter slow key o','ils: table key filter query customer query scan filter value'),
(65,153,3,9,'Doc 65
the filter line row merge table stream table hash sor','he full guide for background and details: query the agg hash'),
(66,407,3,9,'Doc 66
a row customer column customer vector hash row custom','column table stream data the hash batch window hash customer'),
(67,387,3,9,'Doc 67
key stream agg row vector data join key line big stre','olumn join window merge hash vector big sort the scan column'),
(68,240,3,9,'Doc 68
key hash slow join value scan customer scan value the','ash a value customer fast customer column key part key order'),
(69,363,3,9,'Doc 69
column agg stream window order query filter scan valu','r table a the customer query join fast slow order query sort'),
(70,564,3,9,'Doc 70
the column customer data stream slow window hash part','r line value a table line row order join value key table dup'),
(71,390,3,9,'Doc 71
filter vector agg vector filter query data group merg','fast line hash window a key value join filter group sort row'),
(72,285,3,9,'Doc 72
hash sort filter customer join slow key filter part t','a fast window scan order big part join hash stream part sort'),
(73,558,3,9,'Doc 73
join part data agg part line row small order row the ','ustomer small column value scan part customer scan slow join'),
(74,102,3,9,'Doc 74
data batch data key data column big key key slow
See ',' key key slow
See the full guide for background and details:'),
(75,366,3,9,'Doc 75
customer row a big scan small batch agg small join ke','ow column window agg row column customer customer key vector'),
(76,437,3,9,'Doc 76
table big column join key the merge join big query sl','e line filter row value merge batch sort vector agg row part'),
(77,373,3,9,'Doc 77
a table window key batch slow column big order join f','w spark batch spark batch query filter group join part query'),
(78,287,3,9,'Doc 78
data sort column stream big join agg small query hash','r hash order column merge fast vector row batch a filter key'),
(79,117,3,9,'Doc 79
sort filter the spark query group key stream fast a s','a small order
See the full guide for background and details:'),
(80,227,3,9,'Doc 80
part a vector hash big join the order big filter hash','tomer a part filter scan data join merge join filter big the'),
(81,412,3,9,'Doc 81
batch column big order column table order table group','order table window data vector big data merge key join group'),
(82,314,3,9,'Doc 82
table batch merge small a key customer small line lin','ey small the order order row scan group hash data batch sort'),
(83,143,3,9,'Doc 83
value table hash query query line order batch custome','er p
See the full guide for background and details: art slow'),
(84,458,3,9,'Doc 84
hash part order hash scan group sort data spark custo','small batch stream window fast sort small batch window batch'),
(85,209,3,9,'Doc 85
row big table table part customer sort query a agg co','l batch order big table hash batch table small row agg big a'),
(86,192,3,9,'Doc 86
value join merge window value value vector filter bat','s: row slow query group customer data value window slow line'),
(87,183,3,9,'Doc 87
query filter vector spark scan part join group batch ','nd details: w order filter row key part group a batch column'),
(88,344,3,9,'Doc 88
customer table group stream row scan row fast fast ba','agg data value scan customer value stream small sort a batch'),
(89,196,3,9,'Doc 89
hash spark stream part table agg order group big scan','oup sort stream value hash sort data spark value value row a'),
(90,166,3,9,'Doc 90
row data hash agg order the fast window a line big qu','for background and details: a batch big column key row agg a'),
(91,485,3,9,'Doc 91
batch small table spark query query a agg part join h','e vector window small merge merge table stream window a hash'),
(92,200,3,9,'Doc 92
the spark query slow small table slow value the custo','merge fast small vector hash order data query join order dup'),
(93,184,3,9,'Doc 93
vector column column vector a scan key data filter th','d details: stream part fast merge column line line row key a'),
(94,197,3,9,'Doc 94
slow slow query scan customer batch big vector order ','dow group scan customer query order table a batch group slow'),
(95,351,3,9,'Doc 95
part part small row merge merge order hash batch row ','uery merge group slow query fast a vector query key hash big'),
(96,509,3,9,'Doc 96
column line sort key window query merge column agg sl','y the part row group query agg agg a join hash slow customer'),
(97,375,3,9,'Doc 97
scan key spark line a small agg value row big custome','e vector the the big vector small query key merge join batch'),
(98,581,3,9,'Doc 98
spark scan spark table hash batch vector key customer','r spark big window table small group scan vector spark batch'),
(99,251,3,9,'Doc 99
column key hash value agg sort a spark filter slow ba','r data value data slow hash the small stream batch fast data'),
(100,516,3,9,'Doc 100
batch data join scan table slow filter filter value ',' scan query small vector part sort stream small window query'),
(101,287,3,9,'Doc 101
table join fast slow query customer join filter data','ow join column agg big big scan row group table customer big'),
(102,571,3,9,'Doc 102
customer vector key the filter merge hash small filt','up query customer column scan filter customer data the group'),
(103,583,3,9,'Doc 103
customer query big batch scan scan big table small f','ry join spark data big vector group merge order group stream'),
(104,302,3,9,'Doc 104
row sort value the hash data order merge stream hash','h agg key batch data spark line small vector batch data data'),
(105,384,3,9,'Doc 105
the fast column batch value hash filter scan sort wi','eam fast line column big order the batch sort agg value sort'),
(106,125,3,9,'Doc 106
small join fast vector join query sort row big order','er slow small
See the full guide for background and details:'),
(107,268,3,9,'Doc 107
hash query group row line stream join window key fas','ustomer row order scan vector query filter spark key big dup'),
(108,141,3,9,'Doc 108
table batch fast table key filter value a table big ',' small
See the full guide for background and details: stream'),
(109,451,3,9,'Doc 109
part spark line order fast group key column order ag','h vector table slow column line line order filter fast spark'),
(110,109,3,9,'Doc 110
scan merge part agg table key big merge slow row sma','low row small
See the full guide for background and details:'),
(111,585,3,9,'Doc 111
merge merge part agg merge part agg key small spark ','ndow fast query line spark row query filter query value sort'),
(112,378,3,9,'Doc 112
vector order the scan the vector window batch merge ',' value merge row small table table join sort batch scan fast'),
(113,483,3,9,'Doc 113
scan hash filter line agg batch query the window joi','ey table merge join customer hash scan vector merge customer'),
(114,262,3,9,'Doc 114
customer row stream slow customer order fast order a','ast spark stream slow line small small key batch value table'),
(115,188,3,9,'Doc 115
row part key vector table customer fast row line sca','etails: ector vector merge key part column order group batch'),
(116,117,3,9,'Doc 116
small window part customer query filter slow batch q','h query query
See the full guide for background and details:'),
(117,302,3,9,'Doc 117
scan group query query a query sort scan slow the ha','h scan merge line value group part scan scan data batch hash'),
(118,452,3,9,'Doc 118
table stream batch data customer stream agg value pa','rder the sort data group fast batch merge spark small stream'),
(119,142,3,9,'Doc 119
column filter agg row agg vector part batch join gro','tomer
See the full guide for background and details: agg the'),
(120,267,3,9,'Doc 120
spark column vector stream key line value order big ','customer query stream batch scan column spark group hash dup'),
(121,223,3,9,'Doc 121
spark big batch column order value query data value ','can query filter the hash window merge customer row agg slow'),
(122,158,3,9,'Doc 122
customer key customer spark merge slow big the scan ','ull guide for background and details: ne fast spark sort agg'),
(123,213,3,9,'Doc 123
the stream order customer big join batch stream data','stomer filter sort data row agg sort window group the column'),
(124,367,3,9,'Doc 124
slow agg stream column sort group data stream fast m','ry key batch value key data the data slow agg line key small'),
(125,240,3,9,'Doc 125
fast the join part table order stream slow table ord',' value big small spark line window query a vector slow table'),
(126,565,3,9,'Doc 126
key hash line the merge customer spark order custome','w spark row window customer vector hash line key small order'),
(127,490,3,9,'Doc 127
part small fast table vector table data hash window ','erge join merge vector query scan table big join sort a line'),
(128,510,3,9,'Doc 128
value filter hash scan data the batch data stream bi','r fast vector filter merge a agg line filter merge value the'),
(129,495,3,9,'Doc 129
filter join the merge spark row merge filter merge v',' join small agg table small table merge line customer vector'),
(130,206,3,9,'Doc 130
spark table batch window value query line key batch ','column window sort column the slow part agg join stream part'),
(131,349,3,9,'Doc 131
row merge join slow column order stream scan sort a ','a a join query order filter stream row vector big slow small'),
(132,385,3,9,'Doc 132
join row small a big a stream line spark the filter ','w group order small the vector scan small column stream hash'),
(133,555,3,9,'Doc 133
row customer column table fast key vector small scan',' fast a part part fast batch the sort stream value sort slow'),
(134,188,3,9,'Doc 134
query filter vector spark scan part join group batch','etails: w order filter row key part group a batch column dup'),
(135,594,3,9,'Doc 135
merge fast part customer spark slow big stream order','ta sort row hash spark small key spark small the query order'),
(136,390,3,9,'Doc 136
a hash big join line row join merge agg query line v','small batch line filter join sort hash small hash slow query'),
(137,288,3,9,'Doc 137
line a query stream table column query column spark ','oin window scan sort filter the row slow query filter column'),
(138,420,3,9,'Doc 138
data filter key filter row data vector join key vect','group table join vector customer window key sort slow stream'),
(139,350,3,9,'Doc 139
stream customer small small order order slow a the v','ery spark join line value data a sort window agg scan stream'),
(140,213,3,9,'Doc 140
group agg big query filter the sort agg value sort w','rge customer small scan stream group vector merge vector big'),
(141,487,3,9,'Doc 141
scan a hash key value customer slow query value slow','e line fast small slow data key join scan small value window'),
(142,567,3,9,'Doc 142
the small query line customer slow filter filter slo','r agg spark value key slow group join vector batch hash hash'),
(143,467,3,9,'Doc 143
a part filter scan slow spark key vector filter sort','gg column merge part row query filter filter order part scan'),
(144,144,3,9,'Doc 144
column row row the key agg hash spark join batch gro','part
See the full guide for background and details: scan key'),
(145,456,3,9,'Doc 145
slow batch hash filter spark sort order stream data ','atch fast fast agg table data agg spark sort group the spark'),
(146,185,3,9,'Doc 146
vector spark the merge value vector merge data scan ','d details: stomer line window vector scan stream hash column'),
(147,497,3,9,'Doc 147
group batch key small value stream hash batch agg cu','rge hash hash vector agg value batch filter spark scan value'),
(148,253,3,9,'Doc 148
value spark stream merge sort a filter row slow slow',' merge small value column slow hash stream slow slow the agg'),
(149,212,3,9,'Doc 149
the row query batch query row spark part data column','w customer table customer batch value batch order small slow'),
(150,329,3,9,'Doc 150
sort join join vector query fast customer part slow ','batch hash customer big group vector filter order spark part'),
(151,574,3,9,'Doc 151
stream sort sort sort value agg join agg filter merg','in query the spark key data window filter big query customer'),
(152,273,3,9,'Doc 152
fast merge row data slow batch agg a small customer ','e customer merge the big scan batch scan a vector vector dup'),
(153,488,3,9,'Doc 153
column the the slow vector fast fast column group a ','t spark line batch spark spark fast sort sort line data fast'),
(154,498,3,9,'Doc 154
sort order value a column slow hash line scan merge ','gg table agg table the window filter sort filter join sort a'),
(155,423,3,9,'Doc 155
window join merge agg value agg query filter the vec','can customer key batch customer query a customer vector fast'),
(156,178,3,9,'Doc 156
hash sort small slow big group order small data hash','ound and details: tomer scan order stream window sort vector'),
(157,146,3,9,'Doc 157
slow hash batch line stream row merge small column b','an
See the full guide for background and details: customer a'),
(158,162,3,9,'Doc 158
hash customer table filter table value group vector ','guide for background and details: p batch hash customer fast'),
(159,434,3,9,'Doc 159
data table merge agg fast group query part key colum','in data query join query spark big big row join vector spark'),
(160,301,3,9,'Doc 160
batch filter the order order a query filter scan str','uery join filter agg hash stream hash window customer a data'),
(161,529,3,9,'Doc 161
fast join key customer the sort table value fast joi',' row batch scan line merge hash filter part scan merge spark'),
(162,514,3,9,'Doc 162
customer window order filter scan vector small a fil','scan table agg sort part batch small scan window value small'),
(163,313,3,9,'Doc 163
row window value batch scan vector agg fast part tab','line fast value stream filter key order customer query group'),
(164,164,3,9,'Doc 164
key table query part window filter stream column has','ide for background and details: mer a sort batch group query'),
(165,163,3,9,'Doc 165
slow value spark hash join big merge slow a sort bat','ide for background and details: key fast hash group customer'),
(166,383,3,9,'Doc 166
query column group agg filter value query join scan ','e table window line join fast customer join vector fast sort'),
(167,531,3,9,'Doc 167
key vector stream group spark table hash join window',' stream big fast the part slow data filter a scan table line'),
(168,283,3,9,'Doc 168
small query slow customer slow query join batch stre','join part fast customer vector value slow sort order value a'),
(169,454,3,9,'Doc 169
window join value line customer line row customer ve','indow table group join vector filter hash part agg key value'),
(170,180,3,9,'Doc 170
group column batch big customer join batch part colu','nd and details: h the slow part table query fast window hash'),
(171,384,3,9,'Doc 171
query big vector slow table slow line window slow ve',' hash join a small scan vector small column table sort table'),
(172,159,3,9,'Doc 172
sort scan vector stream part scan row agg spark a bi','ll guide for background and details: uery table join a query'),
(173,596,3,9,'Doc 173
group row vector table data value key hash spark joi',' join filter a join data agg part window slow sort spark the'),
(174,371,3,9,'Doc 174
slow row query table agg hash spark line join data s','omer join agg join customer value row merge filter scan data'),
(175,214,3,9,'Doc 175
group group order fast value sort column window grou',' group row sort data row customer merge hash table value big'),
(176,547,3,9,'Doc 176
hash agg a hash big data row value batch stream wind','erge small key spark filter filter scan hash batch hash hash'),
(177,318,3,9,'Doc 177
the key query window agg spark table scan window par','line line merge scan merge slow agg order filter small value'),
(178,269,3,9,'Doc 178
fast merge row data slow batch agg a small customer ','value customer merge the big scan batch scan a vector vector'),
(179,539,3,9,'Doc 179
key small big data query part column slow join strea',' window fast big stream vector vector small fast table group'),
(180,241,3,9,'Doc 180
agg query part merge filter customer spark scan tabl','rt filter vector window batch group big line small the order'),
(181,164,3,9,'Doc 181
filter part customer the customer table column batch','ide for background and details: order query filter sort part'),
(182,398,3,9,'Doc 182
agg key order row vector batch customer the join que','ta sort small big filter join agg hash data order group line'),
(183,154,3,9,'Doc 183
window order join line batch query a join scan vecto','he full guide for background and details: small row agg part'),
(184,496,3,9,'Doc 184
part a value query key table customer vector agg slo','ey group agg group vector join big key hash value scan spark'),
(185,361,3,9,'Doc 185
merge small small the order agg order table a order ','big column scan a key batch agg table column agg value batch'),
(186,469,3,9,'Doc 186
row table query scan vector order sort line a join t','n query a slow a a slow query agg stream row sort data group'),
(187,553,3,9,'Doc 187
a group scan hash big filter agg the stream window s','atch table value group filter line merge hash data key batch'),
(188,302,3,9,'Doc 188
merge stream a window batch order spark line data fi','a scan merge agg join agg window spark fast line spark group'),
(189,262,3,9,'Doc 189
group window line slow value big query stream part v','ort value part filter table merge a column spark table value'),
(190,483,3,9,'Doc 190
table spark fast a hash value vector join agg row co','alue the slow part value merge order sort spark window small'),
(191,173,3,9,'Doc 191
customer merge scan batch fast small join agg group ','ackground and details: hash order fast agg table scan column'),
(192,187,3,9,'Doc 192
filter column table part row join column the agg tab','details: hash column part merge group order row a slow group'),
(193,223,3,9,'Doc 193
line join batch query key batch batch small stream k','fast order customer data group row merge the value data part'),
(194,211,3,9,'Doc 194
the scan big row query column a stream merge order s','lue merge column row line window stream spark sort join join'),
(195,373,3,9,'Doc 195
small scan small merge customer spark agg fast big m','n column group scan spark table key big group data table row'),
(196,395,3,9,'Doc 196
filter big column slow agg batch query merge value s','r vector group customer big merge filter join row order data'),
(197,578,3,9,'Doc 197
a query merge column the column big line filter a cu','ne agg filter big batch big line table hash row merge stream'),
(198,309,3,9,'Doc 198
slow hash join agg stream small agg line fast fast s','ine part order spark merge filter agg batch part table merge'),
(199,209,3,9,'Doc 199
column query agg slow sort table the data customer k','merge scan group spark hash table column key hash vector the'),
(200,358,3,9,'Doc 200
part hash agg value big slow stream query vector a j','tomer order key customer row merge big a column small window'),
(201,371,3,9,'Doc 201
line merge batch value group filter fast key table v','filter slow row big agg table line join key small hash group'),
(202,536,3,9,'Doc 202
join key window hash query key data table fast key s','query a sort slow window slow spark window stream join order'),
(203,184,3,9,'Doc 203
column table line batch slow query value scan sort p','nd details: h a vector window slow data hash batch query row'),
(204,173,3,9,'Doc 204
vector group group join table join agg part sort bat','ackground and details: ine window sort fast merge fast small'),
(205,432,3,9,'Doc 205
join hash agg batch the big window data vector key w','part hash vector row window a merge sort fast query customer'),
(206,186,3,9,'Doc 206
key the slow small join merge query big table row ha',' details: ash filter the big row table slow filter big merge'),
(207,440,3,9,'Doc 207
merge big join batch scan vector part table hash sma','or join hash line scan part hash fast stream table line line'),
(208,170,3,9,'Doc 208
hash order the line key data key line stream agg has','r background and details: hash scan order value order window'),
(209,279,3,9,'Doc 209
big spark fast sort group big fast hash hash value f','ig fast column hash slow query key slow key spark group sort'),
(210,571,3,9,'Doc 210
customer batch window column data order small vector','ta small query part column hash spark key window table small'),
(211,335,3,9,'Doc 211
column key line sort spark big query window value ta','he join scan scan value table row batch stream row group row'),
(212,309,3,9,'Doc 212
vector small hash group customer small vector sort s','am big filter vector big a order value customer stream order'),
(213,523,3,9,'Doc 213
fast part scan line column agg table table fast quer','g filter batch query window big customer merge hash row line'),
(214,124,3,9,'Doc 214
data query part the customer scan query window agg r','ash hash part
See the full guide for background and details:'),
(215,583,3,9,'Doc 215
slow the batch batch a customer query filter batch f','tream window line table the value filter row small the merge'),
(216,584,3,9,'Doc 216
column group spark sort value customer a small strea','a merge group customer scan query customer filter fast group'),
(217,405,3,9,'Doc 217
table part key sort column key line hash small sort ','n scan window key small spark order a a sort customer window'),
(218,510,3,9,'Doc 218
data line table small value stream stream part agg f','filter query query group data column vector table vector big'),
(219,231,3,9,'Doc 219
scan order customer big vector scan customer table c',' part customer small fast merge table stream scan agg stream'),
(220,608,3,9,'Doc 220
part sort group column data agg vector order sort a ',' join the order filter key value table stream slow key table'),
(221,276,3,9,'Doc 221
join order value key vector stream customer fast cus','h filter scan scan vector line a slow big the row batch data'),
(222,317,3,9,'Doc 222
vector spark window scan line part table customer ve',' part value part batch a query data line the the fast scan a'),
(223,515,3,9,'Doc 223
table vector group the agg table part part customer ','indow group row small hash agg part stream data vector value'),
(224,498,3,9,'Doc 224
scan part batch customer group join window data scan','e the spark filter value customer row value value row stream'),
(225,474,3,9,'Doc 225
small join agg big value scan small key column slow ','n value part customer column part batch row value batch data'),
(226,164,3,9,'Doc 226
part vector small the spark order order table small ','ide for background and details: small part group query table'),
(227,523,3,9,'Doc 227
join part table filter agg small hash value customer',' small sort the sort column key vector value customer filter'),
(228,519,3,9,'Doc 228
hash fast window vector row fast big sort a slow que','alue slow column data join data customer join window a merge'),
(229,465,3,9,'Doc 229
the order join group join order the part vector spar','r spark order group the value query group hash hash sort row'),
(230,367,3,9,'Doc 230
the query value vector spark group order key scan or','r batch scan key column part slow vector small filter column'),
(231,211,3,9,'Doc 231
a part window slow spark table fast filter data orde','r vector merge group batch hash customer filter big column a'),
(232,372,3,9,'Doc 232
key column a hash join big sort spark vector merge q','g row scan the hash join big small batch fast key scan batch'),
(233,513,3,9,'Doc 233
join data data query join sort merge row hash custom','st key agg line value stream part vector batch the big value'),
(234,400,3,9,'Doc 234
a key batch query merge merge big big small window f','vector big filter agg sort window scan batch value spark agg'),
(235,280,3,9,'Doc 235
key fast customer batch window row group query agg t','er fast data value spark join spark filter small spark spark'),
(236,117,3,9,'Doc 236
table column agg join group data line sort table has','hash line dup
See the full guide for background and details:'),
(237,472,3,9,'Doc 237
part the table batch line the table line group table','rder fast stream query vector query a value join spark group'),
(238,313,3,9,'Doc 238
query query part slow order key value fast window me','key scan order spark slow spark window merge big join filter'),
(239,220,3,9,'Doc 239
fast part batch filter row vector window window line','lue row vector line group scan data a hash small window sort'),
(240,435,3,9,'Doc 240
the fast fast fast stream slow sort group order wind','filter key query sort window group vector the data key table'),
(241,566,3,9,'Doc 241
a key column value spark spark line batch data colum','art spark the filter value spark batch vector slow order the'),
(242,444,3,9,'Doc 242
join sort vector filter merge value order row window','a window sort agg line batch customer big scan customer line'),
(243,234,3,9,'Doc 243
hash merge batch a window filter sort customer a par','ry batch sort hash query small query sort fast row line part'),
(244,426,3,9,'Doc 244
query order part vector value customer column agg ag','e order order scan spark part row slow join batch query scan'),
(245,522,3,9,'Doc 245
the spark join stream a small order merge column gro','g scan agg order fast row window slow group group spark part'),
(246,231,3,9,'Doc 246
agg column part slow scan the merge key sort hash th',' sort part the spark big line scan customer batch filter the'),
(247,486,3,9,'Doc 247
slow order stream a the fast order table batch big s','ge query stream query stream hash join scan slow table batch'),
(248,502,3,9,'Doc 248
customer batch query agg slow window group filter ha','key column big data sort small scan filter filter hash spark'),
(249,487,3,9,'Doc 249
order table key key filter row the a a row customer ','le hash filter scan slow hash filter batch a join filter key'),
(250,303,3,9,'Doc 250
value spark order filter vector batch line agg the g','ash the the stream data scan agg group spark window customer'),
(251,578,3,9,'Doc 251
part window fast group merge spark line data table c','er stream agg vector fast fast query group vector slow spark'),
(252,308,3,9,'Doc 252
spark window filter value key vector hash scan custo','e line scan agg sort customer merge a merge merge merge line'),
(253,253,3,9,'Doc 253
key query merge sort slow scan agg sort window vecto','ine batch part row the table line big table spark agg a data'),
(254,158,3,9,'Doc 254
key sort table sort vector part hash sort data group','ll guide for background and details: agg order column column'),
(255,212,3,9,'Doc 255
row spark slow merge customer big spark customer slo','g big stream stream row line slow customer hash a merge data'),
(256,117,3,9,'Doc 256
group merge query scan sort small data hash query qu',' query filter
See the full guide for background and details:'),
(257,170,3,9,'Doc 257
the value sort vector agg scan merge batch filter ha','r background and details: w data stream slow data small fast'),
(258,451,3,9,'Doc 258
small small the merge batch join row small vector bi','e agg spark customer sort spark stream customer merge fast a'),
(259,314,3,9,'Doc 259
line data slow data a vector scan customer hash wind',' order line part big agg agg vector column spark scan column'),
(260,190,3,9,'Doc 260
order part slow big hash table data data table the s','ails: ble merge big order agg order key small the spark line'),
(261,528,3,9,'Doc 261
a data small hash big row fast window slow window va','er order table table a line big row vector part batch stream'),
(262,311,3,9,'Doc 262
a column data hash window spark part join batch wind','w hash scan stream the data table the the slow filter a fast'),
(263,503,3,9,'Doc 263
data a big value table batch fast agg join data spar','r key fast merge order big line filter stream a group vector'),
(264,600,3,9,'Doc 264
table order scan scan part merge column column group','rt small window agg a data agg batch line slow customer join'),
(265,324,3,9,'Doc 265
table hash join big stream part column hash part mer','mn merge customer part merge column group small value column'),
(266,281,3,9,'Doc 266
line key filter join group the key customer merge cu','ast order window scan agg scan a row customer small customer'),
(267,479,3,9,'Doc 267
merge group part scan row value column batch the tab','rk query big part merge table join row slow hash batch small'),
(268,271,3,9,'Doc 268
data join stream a row the join the table the filter','art filter join small small table agg hash merge order batch'),
(269,522,3,9,'Doc 269
data scan slow slow hash spark order window merge li','data a the window line key group stream spark scan hash part'),
(270,554,3,9,'Doc 270
column filter row merge a window key scan row fast b','line customer merge customer query fast big hash stream data'),
(271,350,3,9,'Doc 271
window spark sort scan agg spark merge column fast s','filter hash small slow row a vector slow batch group row big'),
(272,542,3,9,'Doc 272
slow fast join part filter data group order column g','ter column fast fast hash stream sort line column small join'),
(273,213,3,9,'Doc 273
agg table window scan table part column query vector','vector key vector merge order part sort value key scan query'),
(274,592,3,9,'Doc 274
window sort the sort big slow part data key table sm','n row customer agg stream batch row batch part row sort sort'),
(275,104,3,9,'Doc 275
a row a window merge hash window group order join
Se','up order join
See the full guide for background and details:'),
(276,593,3,9,'Doc 276
window hash small customer customer vector vector sc','mall row spark filter part order small scan data table table'),
(277,218,3,9,'Doc 277
query spark query spark spark key big column a join ','y query spark fast merge hash value data fast key a row join'),
(278,450,3,9,'Doc 278
row table column spark hash merge table row row tabl','y fast column order column column column filter small column'),
(279,336,3,9,'Doc 279
value a slow small batch fast part hash agg slow bat',' sort slow value hash vector scan column column filter table'),
(280,525,3,9,'Doc 280
scan window value fast agg table stream data batch m','ow slow key column big fast hash order join fast merge spark'),
(281,226,3,9,'Doc 281
row key slow merge customer group key order window p','ine value spark agg line column filter sort filter merge row'),
(282,234,3,9,'Doc 282
a column scan small stream a column data join sort v','art join agg batch stream data spark batch sort batch filter'),
(283,527,3,9,'Doc 283
customer hash customer agg small window small key qu','ector line fast join window big vector slow batch part group'),
(284,334,3,9,'Doc 284
batch agg data line value slow hash sort window sort','stream table customer spark scan fast key the data spark row'),
(285,567,3,9,'Doc 285
group fast fast data row data stream part stream has','lumn filter hash line hash scan value data slow big hash dup'),
(286,314,3,9,'Doc 286
value a join query row query table filter spark valu',' table scan the vector table slow slow batch agg stream hash'),
(287,157,3,9,'Doc 287
customer merge sort group join the slow spark group ','full guide for background and details: eam spark vector hash'),
(288,231,3,9,'Doc 288
a key part scan scan customer sort filter group grou','ble customer column window a query slow customer small small'),
(289,279,3,9,'Doc 289
a group stream merge merge window window customer gr','big vector big window table fast slow table hash window fast'),
(290,586,3,9,'Doc 290
spark scan spark table hash batch vector key custome','ark big window table small group scan vector spark batch dup'),
(291,472,3,9,'Doc 291
join key scan spark query part small row hash vector','tor order scan table join merge stream order window a column'),
(292,513,3,9,'Doc 292
batch merge query fast vector slow line query spark ',' merge order customer line part batch join the row batch agg'),
(293,440,3,9,'Doc 293
column stream spark hash group join key table join w','rk order filter data filter order fast group group big group'),
(294,526,3,9,'Doc 294
row hash agg value column merge stream sort window s','e sort data window agg a scan big the the batch group column'),
(295,242,3,9,'Doc 295
order filter query key vector query scan slow big jo','ector order column part data join value slow table small dup'),
(296,414,3,9,'Doc 296
batch fast join vector big vector filter spark spark','he data part merge vector line hash agg key line join vector'),
(297,378,3,9,'Doc 297
part key table row data order key merge column custo','t data scan agg agg line spark stream line part the the line'),
(298,245,3,9,'Doc 298
order filter vector batch vector data hash small sor','an stream window column key small value fast column key part'),
(299,557,3,9,'Doc 299
query table spark data join key big vector small mer','row column join vector a row customer hash order join vector'),
(300,272,3,9,'Doc 300
vector vector stream stream fast the batch a line gr','ey join key row key stream fast customer agg big query small'),
(301,563,3,9,'Doc 301
group fast fast data row data stream part stream has','r column filter hash line hash scan value data slow big hash'),
(302,539,3,9,'Doc 302
table a join fast spark column spark batch big group','filter customer vector sort group group batch agg value scan'),
(303,510,3,9,'Doc 303
customer small filter hash key key order merge line ','n query big stream value a value column customer filter fast'),
(304,275,3,9,'Doc 304
row column value batch query query key big sort fast','hash vector a column the batch filter merge batch part table'),
(305,118,3,9,'Doc 305
filter stream agg small filter batch scan row stream','am small join
See the full guide for background and details:'),
(306,476,3,9,'Doc 306
order value stream table value vector table a big or','n customer order stream agg slow the stream value line small'),
(307,358,3,9,'Doc 307
the big filter group small join vector key group val','in data filter fast scan customer query big spark part batch'),
(308,152,3,9,'Doc 308
batch scan window value filter join stream big colum',' the full guide for background and details: slow scan vector'),
(309,294,3,9,'Doc 309
row small column agg value group filter small merge ','ort a order row merge hash the fast agg scan fast group fast'),
(310,204,3,9,'Doc 310
merge join table a slow part table column merge grou','rk big a merge customer part row query query fast filter big'),
(311,551,3,9,'Doc 311
merge join vector the order agg hash window group gr','park stream customer filter value hash spark query row merge'),
(312,424,3,9,'Doc 312
sort filter table agg big spark scan key line scan k','rge join query data window stream group small slow the group'),
(313,143,3,9,'Doc 313
filter scan part a data sort a value value part a ba','rk th
See the full guide for background and details: e value'),
(314,246,3,9,'Doc 314
customer merge agg stream window data part key a spa','ow row query row spark agg agg order line column slow window'),
(315,516,3,9,'Doc 315
group small data line agg spark row merge table fast','ig the scan part line a merge key order join order hash scan'),
(316,463,3,9,'Doc 316
scan data a vector key small fast a spark data data ','h merge merge customer scan value slow scan batch small join'),
(317,464,3,9,'Doc 317
merge value data batch filter hash hash customer sor',' filter hash table row stream line sort agg a key spark data'),
(318,512,3,9,'Doc 318
stream customer row hash column scan stream row vect','ta scan stream query order big part filter agg join a a fast'),
(319,568,3,9,'Doc 319
agg stream fast stream order merge merge a order mer','st big customer line column spark merge sort merge merge key'),
(320,460,3,9,'Doc 320
the big column merge fast a line row agg batch query','ter data slow column fast data query value vector value line'),
(321,348,3,9,'Doc 321
stream vector sort column data stream the spark tabl','rt vector fast small merge value value big window merge data'),
(322,311,3,9,'Doc 322
table window big column fast column key small batch ',' the value stream column fast big order column filter vector'),
(323,387,3,9,'Doc 323
query column group agg filter value query join scan ','ble window line join fast customer join vector fast sort dup'),
(324,284,3,9,'Doc 324
group line slow window slow spark order the merge ta','a vector slow join key hash value line fast group slow value'),
(325,383,3,9,'Doc 325
table small value column merge hash column batch agg','value part batch vector hash row value query a key spark big'),
(326,253,3,9,'Doc 326
scan key hash merge line key vector value query smal','r the the merge line line merge part group vector vector agg'),
(327,237,3,9,'Doc 327
group join merge row key stream fast row sort stream','g stream table fast window query batch row small filter fast'),
(328,551,3,9,'Doc 328
join row big stream small the customer group window ','stream sort vector group query join small row customer merge'),
(329,408,3,9,'Doc 329
merge batch big row sort hash scan window group quer','rt order sort big filter a row customer value group key join'),
(330,372,3,9,'Doc 330
big agg order the group hash data the filter scan co','e sort query filter data join big small table part row query'),
(331,355,3,9,'Doc 331
customer value small join query row key window row m','value key filter stream column part line spark filter filter'),
(332,263,3,9,'Doc 332
spark column vector stream key line value order big ','row customer query stream batch scan column spark group hash'),
(333,233,3,9,'Doc 333
hash query data big table agg merge spark order colu','er small big join row value fast hash window sort value slow'),
(334,540,3,9,'Doc 334
join key value small join row a data query vector jo','ter fast column small slow slow agg slow slow the join batch'),
(335,381,3,9,'Doc 335
column slow filter data customer agg agg hash part d','a window scan filter small vector small vector merge batch a'),
(336,432,3,9,'Doc 336
table hash customer column query line scan merge dat','y filter data join hash filter key line query scan a key big'),
(337,298,3,9,'Doc 337
filter part column group vector merge key sort vecto','tream join vector row fast spark merge slow table line small'),
(338,147,3,9,'Doc 338
data join query spark value row table hash customer ','v
See the full guide for background and details: alue a join'),
(339,243,3,9,'Doc 339
vector vector column stream key scan part batch cust','hash table customer part value row hash key hash row a table'),
(340,303,3,9,'Doc 340
batch group hash group data row customer window merg','rder group filter agg small merge big line key a spark order'),
(341,482,3,9,'Doc 341
part part small row scan fast customer slow window s',' row part agg value batch merge hash merge batch window scan'),
(342,172,3,9,'Doc 342
value vector hash key vector group agg value table k','background and details: ash part value scan vector sort join'),
(343,211,3,9,'Doc 343
row slow data data merge small part data a table the',' batch customer a batch customer data spark filter line part'),
(344,473,3,9,'Doc 344
row key query part order hash agg customer customer ','ey column part window customer big row agg stream merge scan'),
(345,379,3,9,'Doc 345
line data vector sort line scan filter window agg sl','slow column row small part agg stream stream part scan order'),
(346,465,3,9,'Doc 346
fast data customer filter group query batch data bat','r join sort a window key slow table batch sort line slow key'),
(347,337,3,9,'Doc 347
filter query agg query fast spark big the vector slo','tch column hash query query batch data fast hash batch batch'),
(348,187,3,9,'Doc 348
batch order stream batch value batch value slow hash','details: ey customer part fast fast join big spark query row'),
(349,512,3,9,'Doc 349
query row join hash agg column big agg value query s','st window filter sort spark batch data small column fast the'),
(350,523,3,9,'Doc 350
batch join sort value query sort sort stream fast ve','tream sort sort small window query big part stream scan data'),
(351,423,3,9,'Doc 351
a order data query query fast vector data table big ','e table value query join order column group big group stream'),
(352,592,3,9,'Doc 352
a fast order part the sort small group group filter ','ow agg line data column join vector slow join customer order'),
(353,370,3,9,'Doc 353
customer a batch agg order spark sort row order colu','e stream scan agg vector small value small customer a vector'),
(354,482,3,9,'Doc 354
customer slow sort vector spark batch query column b','mer value line vector agg window data big key order customer'),
(355,409,3,9,'Doc 355
spark order scan the batch the group value value gro','customer the value slow customer join window window customer'),
(356,415,3,9,'Doc 356
key key fast order small group value big batch big m','mer slow query part small scan row value key small group agg'),
(357,308,3,9,'Doc 357
hash a sort filter key hash batch order line join pa','in part filter small sort fast fast fast the window big data'),
(358,114,3,9,'Doc 358
join line fast join spark part batch merge scan spar','n spark order
See the full guide for background and details:'),
(359,384,3,9,'Doc 359
sort part part small slow join line sort part data c','uery column a agg value table sort a hash the agg scan merge'),
(360,498,3,9,'Doc 360
vector value small data merge group hash stream part','mer group a vector spark hash small batch fast big value the'),
(361,419,3,9,'Doc 361
window row scan scan table vector row column key dat','t join vector spark scan slow column merge batch scan window'),
(362,137,3,9,'Doc 362
slow data group query spark big join vector merge me','oup the sor
See the full guide for background and details: t'),
(363,413,3,9,'Doc 363
merge table column vector part batch vector row cust','ter part sort join column scan agg hash a window batch order'),
(364,326,3,9,'Doc 364
fast column column line big batch order order part k','slow sort table line data batch table key slow data customer'),
(365,122,3,9,'Doc 365
vector spark agg part merge line fast customer slow ','rt batch hash
See the full guide for background and details:'),
(366,367,3,9,'Doc 366
line column value order line table vector table tabl','tor small join slow part filter scan a order table sort data'),
(367,268,3,9,'Doc 367
scan key vector a row hash stream row hash scan filt','rge customer merge row table order join row query hash small'),
(368,128,3,9,'Doc 368
agg fast value batch spark sort hash line spark stre',' spark stream
See the full guide for background and details:'),
(369,329,3,9,'Doc 369
sort join join small group customer hash spark a ord','customer fast scan batch sort big slow table row column hash'),
(370,302,3,9,'Doc 370
part spark table order customer column table filter ','key spark scan spark batch order query data sort stream scan'),
(371,406,3,9,'Doc 371
window big row window big small the column sort agg ','g table filter table stream table part stream line the query'),
(372,198,3,9,'Doc 372
column big group sort fast agg agg row key data row ','join data row sort batch row slow hash customer merge window'),
(373,443,3,9,'Doc 373
merge line batch table the filter row a row big row ','ue fast window table the hash the row query merge data value'),
(374,238,3,9,'Doc 374
order filter query key vector query scan slow big jo','ow vector order column part data join value slow table small'),
(375,398,3,9,'Doc 375
stream row row order the slow merge key part query s','a row spark window group merge a row batch filter small join'),
(376,422,3,9,'Doc 376
data join join scan vector sort stream filter fast k','lumn stream window sort row group spark order window batch a'),
(377,290,3,9,'Doc 377
hash sort filter customer join slow key filter part ','st window scan order big part join hash stream part sort dup'),
(378,393,3,9,'Doc 378
sort small table scan stream order spark big vector ','rder batch line value scan group sort a join window line the'),
(379,459,3,9,'Doc 379
spark stream fast join window hash vector scan value','erge key fast row spark big window customer slow table value'),
(380,499,3,9,'Doc 380
window the sort small data stream small hash column ','rder query group filter fast a spark value filter agg window'),
(381,409,3,9,'Doc 381
scan join data batch agg agg filter batch order slow','merge row column order part hash filter scan line group hash'),
(382,188,3,9,'Doc 382
customer slow key data filter a spark group scan ord','etails: w column row batch small fast the hash merge the agg'),
(383,310,3,9,'Doc 383
the a column batch customer value vector line group ','join stream customer small row part big line filter hash dup'),
(384,148,3,9,'Doc 384
key agg part sort join sort big small customer strea','
See the full guide for background and details: ta order agg'),
(385,455,3,9,'Doc 385
customer big scan line customer merge hash scan tabl','erge scan fast customer hash stream order a window batch the'),
(386,527,3,9,'Doc 386
filter hash row line join query window data customer','he part filter the batch the fast agg spark customer a spark'),
(387,264,3,9,'Doc 387
hash query group row line stream join window key fas','ll customer row order scan vector query filter spark key big'),
(388,401,3,9,'Doc 388
line sort merge group filter sort order spark column','roup value order the filter group merge window slow agg slow'),
(389,208,3,9,'Doc 389
merge join table a slow part table column merge grou','ig a merge customer part row query query fast filter big dup'),
(390,192,3,9,'Doc 390
slow batch row a a the query merge customer value qu','s: data big agg window key part small small part value spark'),
(391,294,3,9,'Doc 391
window order spark column query order line small a q','ch stream table order order key join data window data column'),
(392,191,3,9,'Doc 392
vector group column order window row key small query','ils: w customer table spark table hash big window line order'),
(393,521,3,9,'Doc 393
fast merge sort fast fast slow sort scan data group ',' stream join line order sort fast column merge spark big dup'),
(394,460,3,9,'Doc 394
query customer join group part column fast data wind','customer line window vector data slow batch order scan small'),
(395,535,3,9,'Doc 395
group customer table order hash customer a merge sca',' spark spark merge batch group big small column filter merge'),
(396,304,3,9,'Doc 396
big small batch small filter data data hash column p','st vector join key stream big merge query query spark window'),
(397,350,3,9,'Doc 397
table key data merge group agg hash slow key column ','fast agg filter key part order query merge window filter key'),
(398,161,3,9,'Doc 398
sort group table column merge line slow big small co',' guide for background and details: uery row fast window hash'),
(399,365,3,9,'Doc 399
column key sort window stream row customer sort row ','a row query data row small spark part table value agg vector'),
(400,189,3,9,'Doc 400
data line line query batch the slow window hash line','ails: join order fast line small agg agg filter batch column'),
(401,494,3,9,'Doc 401
key join the a line line batch window filter stream ','dow sort data fast merge window small order sort stream hash'),
(402,216,3,9,'Doc 402
big scan sort row part line customer group line grou',' window slow row fast the the a customer the line spark line'),
(403,529,3,9,'Doc 403
order window join filter fast hash fast merge a agg ','am part slow filter query small data customer hash scan slow'),
(404,276,3,9,'Doc 404
value slow data stream agg stream join table key sca','ow merge row data table hash merge fast scan hash small part'),
(405,369,3,9,'Doc 405
hash customer key part stream big table column row d','customer the spark window line batch table stream small join'),
(406,516,3,9,'Doc 406
table customer hash vector value a order merge fast ','ow stream slow table batch slow sort sort column order order'),
(407,163,3,9,'Doc 407
hash table agg merge big key stream the order spark ','ide for background and details: merge query small batch scan'),
(408,142,3,9,'Doc 408
query query spark part sort slow batch line data lin','h fast
See the full guide for background and details: filter'),
(409,329,3,9,'Doc 409
small key a spark window hash small stream a part co','r value agg window table column value window scan a part agg'),
(410,469,3,9,'Doc 410
row order a table window value small sort a big tabl','an key agg data part order fast query big window a fast part'),
(411,466,3,9,'Doc 411
vector row spark a hash agg stream small order scan ','ery a sort scan value hash value join window a fast part agg'),
(412,421,3,9,'Doc 412
agg row fast the table scan batch query column sort ','lue join slow sort scan the fast join part a fast part small'),
(413,483,3,9,'Doc 413
merge group part scan row value column batch the tab','uery big part merge table join row slow hash batch small dup'),
(414,464,3,9,'Doc 414
part batch slow window small part column part vector','table part line slow slow sort a fast spark a slow group big'),
(415,369,3,9,'Doc 415
the customer spark slow a batch slow column vector p','in scan column spark big hash fast value scan order the part'),
(416,343,3,9,'Doc 416
key query order sort the slow sort spark merge query','key filter scan customer merge the column sort key big small'),
(417,575,3,9,'Doc 417
window query customer merge customer batch part batc','dow fast hash line hash table agg table a column stream sort'),
(418,495,3,9,'Doc 418
agg row order batch line row small batch part agg sl',' small filter line slow agg join group key window line order'),
(419,170,3,9,'Doc 419
row window data filter small slow join batch hash da','r background and details: ery part value customer big column'),
(420,517,3,9,'Doc 420
fast merge sort fast fast slow sort scan data group ','ream stream join line order sort fast column merge spark big'),
(421,516,3,9,'Doc 421
key line sort small row query window spark filter va','sort hash batch line sort order a query customer column line'),
(422,420,3,9,'Doc 422
join group window group value batch row data batch s','der sort agg fast window value table filter batch hash merge'),
(423,418,3,9,'Doc 423
join order part group merge customer spark data line','ta scan small query small filter group table scan order fast'),
(424,465,3,9,'Doc 424
join sort merge row stream part fast the table join ','group agg stream vector a filter vector batch merge customer'),
(425,186,3,9,'Doc 425
a slow line join vector spark batch column group col','details: small small slow big the fast row vector value data'),
(426,507,3,9,'Doc 426
merge fast sort fast value order batch small part li','vector window the query customer line stream key hash stream'),
(427,476,3,9,'Doc 427
a key window small data column part part stream quer','window line query batch filter query window part query group'),
(428,335,3,9,'Doc 428
filter slow row sort group row fast big hash part ha','er query data query group stream column customer slow column'),
(429,593,3,9,'Doc 429
query data column key key a batch big fast filter sc','g merge spark line hash order line customer part fast filter'),
(430,455,3,9,'Doc 430
customer sort value spark big sort agg table spark v','h batch window a group batch fast hash the table scan stream'),
(431,363,3,9,'Doc 431
vector spark big order slow part hash order the orde','ery value row join part order group table value small column'),
(432,414,3,9,'Doc 432
scan hash agg table small stream vector query data o','e sort small spark big value part stream query column column'),
(433,232,3,9,'Doc 433
the slow join table batch merge slow customer slow s',' window table value spark agg agg value window big data line'),
(434,479,3,9,'Doc 434
column query key big vector filter line fast fast a ','ustomer join table small a table small merge order slow scan'),
(435,222,3,9,'Doc 435
part stream agg scan table column fast sort merge da','window fast spark slow hash query join scan order merge join'),
(436,332,3,9,'Doc 436
group row window agg sort fast row the part column w','w scan batch big row window merge agg group small a customer'),
(437,496,3,9,'Doc 437
order data value fast batch row customer table big j','query batch key line join key the value customer table small'),
(438,227,3,9,'Doc 438
fast line order value merge part column big vector s',' vector row merge part data vector merge key query slow fast'),
(439,240,3,9,'Doc 439
group line batch small batch join group spark a batc',' a line vector row customer agg hash window filter the query'),
(440,298,3,9,'Doc 440
customer order the join part sort order filter filte','ne stream column line stream query customer batch value data'),
(441,598,3,9,'Doc 441
slow window small filter merge order order small gro',' line big join table key spark group vector vector row order'),
(442,510,3,9,'Doc 442
stream query order value part query spark batch quer',' stream data the the group fast small filter line scan order'),
(443,336,3,9,'Doc 443
big filter a the row slow sort a a filter a fast par','lumn query join value stream vector key column window filter'),
(444,475,3,9,'Doc 444
key filter vector join order batch key value merge c','ow batch value fast agg key sort column a window data column'),
(445,363,3,9,'Doc 445
small scan data agg query fast row scan spark row fi','lumn hash small fast a table spark filter line data big slow'),
(446,188,3,9,'Doc 446
data data sort agg scan value the hash column line f','etails: m a merge row line row stream value order filter dup'),
(447,561,3,9,'Doc 447
the column customer data stream slow window hash par','order line value a table line row order join value key table'),
(448,341,3,9,'Doc 448
slow line join group filter key sort group hash data',' merge query fast query table scan query query part data the'),
(449,232,3,9,'Doc 449
filter the scan key row row spark window agg the str','w scan filter customer fast merge spark join group line scan'),
(450,197,3,9,'Doc 450
the spark query slow small table slow value the cust','ble merge fast small vector hash order data query join order'),
(451,168,3,9,'Doc 451
a part vector hash key vector join data scan order c','for background and details: can group slow stream slow query'),
(452,414,3,9,'Doc 452
row scan small the fast group stream key merge colum','value customer column batch fast merge row query line stream'),
(453,575,3,9,'Doc 453
filter table part window stream big hash stream filt','y window slow batch scan line row column sort the order line'),
(454,209,3,9,'Doc 454
stream row customer a batch small stream join stream','up scan row batch a table fast filter filter big group merge'),
(455,114,3,9,'Doc 455
table small sort order small hash stream data big ke','big key group
See the full guide for background and details:'),
(456,170,3,9,'Doc 456
fast join key hash spark key part join small agg dat','r background and details: ector a part slow agg the big line'),
(457,257,3,9,'Doc 457
scan key hash merge line key vector value query smal','e the merge line line merge part group vector vector agg dup'),
(458,379,3,9,'Doc 458
key line join order value query customer sort slow p','tch customer column table spark key window vector column big'),
(459,432,3,9,'Doc 459
batch vector row stream key big row a vector slow jo','ble batch vector the vector query big merge join part vector'),
(460,316,3,9,'Doc 460
agg scan column key spark row vector table fast slow','atch customer slow spark hash group query merge slow table a'),
(461,427,3,9,'Doc 461
row merge vector big order line spark data stream cu','h small line query order row value batch batch a fast vector'),
(462,383,3,9,'Doc 462
key line join order value query customer sort slow p','customer column table spark key window vector column big dup'),
(463,547,3,9,'Doc 463
filter the column table big key row data filter scan',' sort sort column order big order query merge stream the agg'),
(464,260,3,9,'Doc 464
batch vector part the the table customer key merge p','the big filter query order filter hash customer customer row'),
(465,375,3,9,'Doc 465
line stream query customer agg filter small agg slow','n customer big row window key scan key order table group big'),
(466,526,3,9,'Doc 466
batch data hash a value a agg batch vector the key b','lue part table big column filter fast table window key value'),
(467,416,3,9,'Doc 467
sort data data window agg filter stream order line b','tomer spark a filter part order row vector column agg filter'),
(468,263,3,9,'Doc 468
column slow key order key scan customer row key key ','lter agg value window data column window key join small slow'),
(469,112,3,9,'Doc 469
row line batch part query query small stream order s',' order stream
See the full guide for background and details:'),
(470,287,3,9,'Doc 470
agg customer key batch query data spark value row a ','scan key merge column line small part customer key row small'),
(471,391,3,9,'Doc 471
batch small vector table small small row window big ',' column merge table column data slow agg join slow spark big'),
(472,264,3,9,'Doc 472
agg stream stream fast filter fast group small value','le line row data part fast fast part window query batch scan'),
(473,349,3,9,'Doc 473
batch agg sort sort vector sort big batch line a key','ustomer line customer row stream stream value line group big'),
(474,412,3,9,'Doc 474
order query key slow the fast spark key customer mer','t vector row a query a value table scan filter data scan the'),
(475,132,3,9,'Doc 475
line spark small key merge sort part query slow grou','agg the value
See the full guide for background and details:'),
(476,139,3,9,'Doc 476
hash vector part spark batch small a query join agg ','lter hash
See the full guide for background and details: key'),
(477,206,3,9,'Doc 477
line slow value window line window agg window data f','ilter window line merge merge a a value value join scan data'),
(478,346,3,9,'Doc 478
window line join the batch vector value filter agg c','ast the group small filter small filter fast hash spark sort'),
(479,444,3,9,'Doc 479
sort merge line hash data sort spark vector stream o',' hash batch vector line slow order agg line join spark query'),
(480,415,3,9,'Doc 480
part key part order row order sort table a part colu','stomer vector column hash column query vector the data big a'),
(481,140,3,9,'Doc 481
line vector value agg group small row value line dat','ue line
See the full guide for background and details: group'),
(482,220,3,9,'Doc 482
filter merge customer sort agg small key the scan th','ark slow row data stream filter stream batch scan slow value'),
(483,301,3,9,'Doc 483
join table slow join customer a spark agg agg query ',' spark vector small big the query fast batch sort table hash'),
(484,276,3,9,'Doc 484
value fast big row a scan the big vector value spark','ge join data row stream column slow column data fast agg key'),
(485,185,3,9,'Doc 485
spark column window data query value group agg big o','d details: w key customer small the vector small filter line'),
(486,226,3,9,'Doc 486
part stream agg scan table column fast sort merge da','ow fast spark slow hash query join scan order merge join dup'),
(487,377,3,9,'Doc 487
key window small key a small row stream part stream ','oin data part fast hash query key data stream customer agg a'),
(488,261,3,9,'Doc 488
value join column join column window vector filter g',' query a join table part line sort value big spark slow sort'),
(489,372,3,9,'Doc 489
customer scan order fast sort small key filter big f','tomer part data spark vector big spark agg big hash big join'),
(490,327,3,9,'Doc 490
window query a the sort part slow the hash hash key ',' group row hash sort key window customer window group column'),
(491,424,3,9,'Doc 491
column batch data table merge column scan join sort ','m order key merge query the key value vector scan row filter'),
(492,132,3,9,'Doc 492
value table vector merge merge window group column b','big big query
See the full guide for background and details:'),
(493,520,3,9,'Doc 493
filter join hash join query row customer row merge r','indow slow vector scan the key column row data customer line'),
(494,262,3,9,'Doc 494
sort table big stream merge row row slow small small','w big spark order spark scan vector scan customer spark data'),
(495,440,3,9,'Doc 495
filter hash spark table the hash group slow value ag','e data hash big slow a row column table row vector scan line'),
(496,513,3,9,'Doc 496
the query filter column group vector the sort small ','art group fast order hash join value order key hash customer'),
(497,178,3,9,'Doc 497
window stream vector merge column order part table c','ound and details: customer hash data customer join row small'),
(498,541,3,9,'Doc 498
value fast part scan fast value row row query merge ','big big stream key order column row agg fast merge value row'),
(499,222,3,9,'Doc 499
line big a small group the window sort group scan th','p merge fast merge big vector a vector value line data spark')
) AS t(doc_id, n_chars_main, n_lines_main, n_lines_all, head60, tail60)
ORDER BY doc_id